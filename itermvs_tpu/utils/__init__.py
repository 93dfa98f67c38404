from itermvs_tpu.utils.jax_cache import enable_persistent_cache
from itermvs_tpu.utils.platform import respect_jax_platforms_env

__all__ = ["enable_persistent_cache", "respect_jax_platforms_env"]
