"""x-vector speaker embedder (models/xvector.py): shape/pooling contracts
and the locality property the design exists for — a frame's embedding must
not change when audio OUTSIDE its receptive field changes (the trunk's
speaker branch fails exactly this, which collapsed diarization; see
tools/diag_diar.py measurements)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnilingual_asr_tpu.config import tiny_config
from omnilingual_asr_tpu.models.xvector import (
    load_xvector,
    save_xvector,
    xvector_frames,
    xvector_init,
    xvector_pooled,
)


@pytest.fixture(scope="module")
def cfg():
    return tiny_config()


@pytest.fixture(scope="module")
def params(cfg):
    return xvector_init(jax.random.PRNGKey(0), cfg)


def test_frame_rate_matches_trunk(cfg, params):
    T = 64
    mel = jnp.ones((2, T, cfg.frontend.n_mels))
    mask = jnp.ones((2, T), bool)
    fr = xvector_frames(params, mel, mask)
    assert fr.shape[:2] == (2, T // cfg.encoder.subsample_factor)


def test_pooled_is_unit_norm(cfg, params):
    mel = jax.random.normal(jax.random.PRNGKey(1),
                            (3, 64, cfg.frontend.n_mels))
    mask = jnp.arange(64)[None, :] < jnp.array([64, 40, 16])[:, None]
    e = xvector_pooled(params, mel, mask)
    assert e.shape == (3, 256)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(e), axis=1),
                               1.0, atol=1e-3)


def test_receptive_field_is_local(cfg, params):
    """Perturbing mel frames > ~1 s away must leave a frame's embedding
    bit-identical up to bf16 noise — the anti-smearing guarantee."""
    T = 256  # 2.56 s of mel at 10 ms hop
    key = jax.random.PRNGKey(2)
    mel = jax.random.normal(key, (1, T, cfg.frontend.n_mels))
    mask = jnp.ones((1, T), bool)
    base = np.asarray(xvector_frames(params, mel, mask))
    # perturb the LAST quarter; inspect an early frame (~0.3 s in)
    mel2 = mel.at[:, 3 * T // 4:, :].add(10.0)
    pert = np.asarray(xvector_frames(params, mel2, mask))
    sub = cfg.encoder.subsample_factor
    probe = int(0.3 * 100) // sub  # frame index ~0.3 s
    np.testing.assert_allclose(base[0, probe], pert[0, probe],
                               rtol=1e-2, atol=1e-2)
    # sanity: frames INSIDE the perturbed region did change
    assert not np.allclose(base[0, -1], pert[0, -1], atol=1e-2)


def test_save_load_roundtrip(cfg, params, tmp_path):
    save_xvector(tmp_path / "xv.npz", params)
    back = load_xvector(tmp_path / "xv.npz", cfg)
    a = np.asarray(params["out"]["w"], np.float16)
    b = np.asarray(back["out"]["w"], np.float16)
    np.testing.assert_array_equal(a, b)


def test_load_rejects_wrong_arch(cfg, params, tmp_path):
    bad = dict(params)
    bad["out"] = {"w": jnp.zeros((7, 7)), "b": jnp.zeros((7,))}
    save_xvector(tmp_path / "bad.npz", bad)
    with pytest.raises((KeyError, ValueError)):
        load_xvector(tmp_path / "bad.npz", cfg)
