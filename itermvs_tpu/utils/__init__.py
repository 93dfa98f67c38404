from itermvs_tpu.utils.jax_cache import enable_persistent_cache

__all__ = ["enable_persistent_cache"]
