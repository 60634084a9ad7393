"""Serialization / checkpoint-resume (schema.proto analog)."""

from common_tpu.io.checkpoint import (  # noqa: F401
    deserialize,
    load,
    save,
    serialize,
)
