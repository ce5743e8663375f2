from dp_gp_lvm_tpu.core import transforms, types  # noqa: F401
from dp_gp_lvm_tpu.core.types import DEFAULT_JITTER, JitterPolicy  # noqa: F401
