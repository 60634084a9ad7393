"""Serialization / checkpoint-resume (schema.proto analog)."""

from common_tpu.io.checkpoint import (  # noqa: F401
    deserialize,
    load,
    save,
    serialize,
)
from common_tpu.io.loader import load_csv_f32  # noqa: F401,E402
