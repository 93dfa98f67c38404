from itermvs_tpu.models.pipeline import Pipeline
from itermvs_tpu.models.losses import full_loss

__all__ = ["Pipeline", "full_loss"]
