"""Full-model parity: our Flax pipeline vs the reference run on torch-CPU.

Loads the released DTU checkpoint into both implementations and compares
test-mode outputs on a synthetic multi-view scene. The reference code is
imported from /root/reference (read-only) purely as a baseline oracle;
skipped when unavailable.
"""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

REFERENCE = "/root/reference"
CKPT = os.path.join(REFERENCE, "checkpoints/dtu/model_000015.ckpt")

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="reference checkpoint unavailable"
)


def _make_scene(rng, batch=1, views=3, height=64, width=96):
    """Synthetic scene: random images + slightly-perturbed cameras."""
    def camera(tz):
        K = np.array([[width * 1.1, 0, width / 2],
                      [0, width * 1.1, height / 2],
                      [0, 0, 1]], np.float32)
        angle = rng.uniform(-0.03, 0.03, 3)
        cx, cy, cz = np.cos(angle)
        sx, sy, sz = np.sin(angle)
        Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        R = (Rx @ Ry @ Rz).astype(np.float32)
        E = np.eye(4, dtype=np.float32)
        E[:3, :3] = R
        E[:3, 3] = [rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2), tz]
        return K, E

    imgs = {}
    projs = {}
    for lvl in range(4):
        h, w = height >> lvl, width >> lvl
        imgs[f"level_{lvl}"] = rng.rand(batch, views, h, w, 3).astype(np.float32) * 2 - 1

    cams = [camera(0.0 if v == 0 else rng.uniform(0.1, 0.3)) for v in range(views)]
    for lvl in range(4):
        mats = []
        for K, E in cams:
            Kl = K.copy()
            Kl[:2] *= 0.5 ** lvl
            P = E.copy()
            P[:3, :4] = Kl @ E[:3, :4]
            mats.append(P)
        projs[f"level_{lvl}"] = np.tile(np.stack(mats)[None], (batch, 1, 1, 1))

    depth_min = np.full((batch,), 2.0, np.float32)
    depth_max = np.full((batch,), 10.0, np.float32)
    return imgs, projs, depth_min, depth_max


def _run_reference(imgs, projs, depth_min, depth_max, iteration=4):
    sys.path.insert(0, REFERENCE)
    try:
        from models.net import Pipeline as TorchPipeline
    finally:
        sys.path.remove(REFERENCE)

    model = TorchPipeline(iteration=iteration, test=True)
    state = torch.load(CKPT, map_location="cpu", weights_only=False)["model"]
    state = {k[len("module."):]: v for k, v in state.items()}
    model.load_state_dict(state)
    model.eval()

    t_imgs = {k: torch.from_numpy(v.transpose(0, 1, 4, 2, 3)) for k, v in imgs.items()}
    t_projs = {k: torch.from_numpy(v) for k, v in projs.items()}
    with torch.no_grad():
        out = model(t_imgs, t_projs, torch.from_numpy(depth_min),
                    torch.from_numpy(depth_max))
    return {
        "depths_upsampled": out["depths_upsampled"].numpy(),      # [B,1,H,W]
        "confidence_upsampled": out["confidence_upsampled"].numpy(),
    }


def _run_ours(imgs, projs, depth_min, depth_max, iteration=4):
    from itermvs_tpu.models import Pipeline
    from itermvs_tpu.engine.torch_import import import_torch_checkpoint

    model = Pipeline(iteration=iteration, test=True)
    variables = import_torch_checkpoint(CKPT)
    out = model.apply(
        variables,
        {k: jnp.asarray(v) for k, v in imgs.items()},
        {k: jnp.asarray(v) for k, v in projs.items()},
        jnp.asarray(depth_min), jnp.asarray(depth_max),
    )
    return {
        "depths_upsampled": np.asarray(out["depths_upsampled"])[..., 0][:, None],
        "confidence_upsampled": np.asarray(out["confidence_upsampled"])[..., 0][:, None],
    }


def test_full_pipeline_parity_test_mode(rng):
    imgs, projs, dmin, dmax = _make_scene(rng)
    ref = _run_reference(imgs, projs, dmin, dmax)
    got = _run_ours(imgs, projs, dmin, dmax)

    d_ref = ref["depths_upsampled"]
    d_got = got["depths_upsampled"]
    # Depth in [2, 10] scene units; demand sub-1% median agreement.
    rel = np.abs(d_got - d_ref) / d_ref
    assert np.median(rel) < 1e-3, f"median rel depth err {np.median(rel)}"
    assert np.mean(rel) < 5e-3, f"mean rel depth err {np.mean(rel)}"

    c_ref = ref["confidence_upsampled"]
    c_got = got["confidence_upsampled"]
    assert np.median(np.abs(c_got - c_ref)) < 1e-3
