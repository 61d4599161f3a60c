"""Codec kernel layer: pure numpy/pyarrow, no Spark dependency."""

from .envelope import (  # noqa: F401
    FLOAT_CODECS,
    INT_CODECS,
    OTHER_CODECS,
    STR_CODECS,
    classify,
    codecs_for,
    decode_array,
    encode_array,
)
from .selector import choose_codec  # noqa: F401
