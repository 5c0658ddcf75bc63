from .msm_sharded import batch_msm_sharded, msm_sharded

__all__ = ["batch_msm_sharded", "msm_sharded"]
