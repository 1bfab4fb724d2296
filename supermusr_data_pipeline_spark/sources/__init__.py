from .decode import decode_stream, dispatch, with_identifier
from .messages import DECODERS, decode_any
from .testdata import load_table, load_tables, register_views

__all__ = [
    "DECODERS",
    "decode_any",
    "decode_stream",
    "dispatch",
    "load_table",
    "load_tables",
    "register_views",
    "with_identifier",
]
