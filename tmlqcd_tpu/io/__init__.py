"""I/O: LIME/ILDG interoperable gauge configurations, SciDAC checksums,
native checkpoints, resume bookkeeping (reference: io/*.c, survey §2.8)."""

from tmlqcd_tpu.io.lime import LimeRecord, read_lime, write_lime  # noqa: F401
from tmlqcd_tpu.io.ildg import read_gauge_field, write_gauge_field  # noqa: F401
from tmlqcd_tpu.io.propagator import read_propagator, write_propagator  # noqa: F401
from tmlqcd_tpu.io.checkpoint import (  # noqa: F401
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
