from .msm_sharded import batch_msm_sharded, msm_sharded
from .batch_verify import batch_verify_sharded

__all__ = ["batch_msm_sharded", "batch_verify_sharded", "msm_sharded"]
