"""Reference-schema parity fixture (FIXTURES.md F2).

Mirrors the reference's unified 12-column Arrow schema
(reference src/osm_arrow.rs:44-95) — id, tags map<str,str>, lat/lon,
nds list<struct<ref>>, members list<struct<type,ref,role>>, changeset,
timestamp(ms-precision values), uid, user, version, visible — so the
engine proves the same nested shapes the reference writes round-trip
bit-identically, with the same per-type null pattern (ways have no
lat/lon: reference src/sink.rs:237-238; node user falls back to "":
src/sink.rs:173-177; relation roles may be null: src/sink.rs:266-269).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TAG_KEYS = ["highway", "name", "amenity", "building", "natural", "waterway"]
ROLES = ["outer", "inner", "stop", None]


def generate_osm_elements(n_rows: int = 5000, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    types = rng.choice(["node", "way", "relation"], n_rows, p=[0.8, 0.15, 0.05])

    ids, tags, lats, lons, nds, members = [], [], [], [], [], []
    changesets, timestamps, uids, users, versions, visibles = [], [], [], [], [], []
    next_id = {"node": 1, "way": 1, "relation": 1}
    base_ms = 1_500_000_000_000

    for i in range(n_rows):
        t = types[i]
        ids.append(next_id[t])
        next_id[t] += 1
        n_tags = int(rng.integers(0, 6))
        tags.append(
            [
                (TAG_KEYS[int(rng.integers(0, len(TAG_KEYS)))], f"v{int(rng.integers(0, 50))}")
                for _ in range(n_tags)
            ]
            or None
        )
        if t == "node":
            lats.append(float(rng.uniform(-90, 90)))
            lons.append(float(rng.uniform(-180, 180)))
            nds.append(None)
            members.append(None)
        elif t == "way":
            lats.append(None)
            lons.append(None)
            start = int(rng.integers(1, 10_000))
            nds.append([{"ref": start + j} for j in range(int(rng.integers(2, 12)))])
            members.append(None)
        else:
            lats.append(None)
            lons.append(None)
            nds.append(None)
            members.append(
                [
                    {
                        "type": ["node", "way", "relation"][int(rng.integers(0, 3))],
                        "ref": int(rng.integers(1, 10_000)),
                        "role": ROLES[int(rng.integers(0, len(ROLES)))],
                    }
                    for _ in range(int(rng.integers(1, 6)))
                ]
            )
        changesets.append(int(rng.integers(1, 10**7)) if rng.random() > 0.05 else None)
        timestamps.append(base_ms + int(rng.integers(0, 10**10)))  # ms precision
        uids.append(int(rng.integers(1, 5000)) if rng.random() > 0.05 else None)
        users.append("" if rng.random() < 0.02 else f"user{int(rng.integers(1, 200))}")
        versions.append(int(rng.integers(1, 30)))
        visibles.append(bool(rng.random() > 0.001))

    schema = pa.schema(
        [
            ("id", pa.int64()),
            ("type", pa.string()),
            ("tags", pa.map_(pa.string(), pa.string())),
            ("lat", pa.float64()),
            ("lon", pa.float64()),
            ("nds", pa.list_(pa.struct([("ref", pa.int64())]))),
            (
                "members",
                pa.list_(
                    pa.struct(
                        [("type", pa.string()), ("ref", pa.int64()), ("role", pa.string())]
                    )
                ),
            ),
            ("changeset", pa.int64()),
            ("timestamp", pa.timestamp("ms")),
            ("uid", pa.int32()),
            ("user", pa.string()),
            ("version", pa.int32()),
            ("visible", pa.bool_()),
        ]
    )
    return pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "type": pa.array([str(t) for t in types], pa.string()),
            "tags": pa.array(tags, schema.field("tags").type),
            "lat": pa.array(lats, pa.float64()),
            "lon": pa.array(lons, pa.float64()),
            "nds": pa.array(nds, schema.field("nds").type),
            "members": pa.array(members, schema.field("members").type),
            "changeset": pa.array(changesets, pa.int64()),
            "timestamp": pa.array(timestamps, pa.timestamp("ms")),
            "uid": pa.array(uids, pa.int32()),
            "user": pa.array(users, pa.string()),
            "version": pa.array(versions, pa.int32()),
            "visible": pa.array(visibles, pa.bool_()),
        },
        schema=schema,
    )
