"""Compatibility re-export; the module lives in utils/varint.py."""
from fqzcomp5_tpu.utils.varint import *  # noqa: F401,F403
from fqzcomp5_tpu.utils.varint import (  # noqa: F401
    get_array_u32, get_u32, get_u64, put_array_u32, put_u32, put_u64)
