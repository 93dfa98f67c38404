"""Worker for the 2-process CPU multi-host test (test_multihost.py).

Joins a jax.distributed cluster on the CPU backend (2 virtual devices
per process → 4 global), loads its per-host slice of a global batch,
assembles the global sharded array, and checks a global reduction sees
every sample exactly once.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    process_id = int(sys.argv[1])
    port = sys.argv[2]

    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=process_id)

    import numpy as np
    import jax.numpy as jnp

    from itermvs_tpu.data.loader import DataLoader
    from itermvs_tpu.parallel.mesh import make_mesh, shard_batch

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"x": np.full((3,), float(i), np.float32)}

    loader = DataLoader(DS(), batch_size=4, shuffle=True, num_workers=2,
                        drop_last=True, seed=3,
                        process_index=jax.process_index(), process_count=2)
    loader.set_epoch(1)
    batches = list(loader)
    assert len(batches) == 2
    assert all(b["x"].shape == (2, 3) for b in batches), [
        b["x"].shape for b in batches]

    mesh = make_mesh()
    garr = shard_batch(batches[0], mesh)["x"]
    assert garr.shape == (4, 3), garr.shape

    total = float(jax.jit(jnp.sum)(garr))
    # Host-side recomputation of the same global first batch.
    order = np.arange(8)
    rng = np.random.default_rng(3 + 1)
    rng.shuffle(order)
    expect = float(order[:4].sum() * 3)
    assert abs(total - expect) < 1e-6, (total, expect)
    print(f"OK process {process_id}")


if __name__ == "__main__":
    main()
