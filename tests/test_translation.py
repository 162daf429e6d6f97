"""Translation decoder tests (architecture contract; model untrained)."""

import jax
import jax.numpy as jnp
import numpy as np

from omnilingual_asr_tpu.config import tiny_config
from omnilingual_asr_tpu.models.translation import (
    decoder_forward,
    greedy_translate,
    tokens_to_text,
    translator_init,
    translator_specs,
)


def setup():
    cfg = tiny_config()
    params = translator_init(jax.random.PRNGKey(0), cfg, n_layers=2)
    return cfg, params


class TestDecoder:
    def test_teacher_forced_shapes(self, rng):
        cfg, params = setup()
        B, Tt, Te, D = 2, 8, 16, cfg.encoder.d_model
        tokens = jnp.asarray(rng.integers(0, 257, (B, Tt)), jnp.int32)
        enc = jnp.asarray(rng.standard_normal((B, Te, D)), jnp.float32)
        enc_mask = jnp.ones((B, Te), bool)
        logits = decoder_forward(params, tokens, enc, enc_mask, cfg,
                                 n_heads=2)
        assert logits.shape == (B, Tt, cfg.vocab.vocab_size)
        assert np.isfinite(np.asarray(logits)).all()

    def test_causality(self, rng):
        """Changing a later token must not affect earlier logits."""
        cfg, params = setup()
        B, Tt, Te, D = 1, 6, 8, cfg.encoder.d_model
        enc = jnp.asarray(rng.standard_normal((B, Te, D)), jnp.float32)
        enc_mask = jnp.ones((B, Te), bool)
        t1 = jnp.asarray(rng.integers(1, 257, (B, Tt)), jnp.int32)
        t2 = t1.at[0, -1].set((t1[0, -1] % 256) + 1)
        l1 = decoder_forward(params, t1, enc, enc_mask, cfg, n_heads=2)
        l2 = decoder_forward(params, t2, enc, enc_mask, cfg, n_heads=2)
        np.testing.assert_allclose(np.asarray(l1[:, :-1]),
                                   np.asarray(l2[:, :-1]), atol=1e-5)

    def test_greedy_decode_runs(self, rng):
        cfg, params = setup()
        B, Te, D = 2, 16, cfg.encoder.d_model
        enc = jnp.asarray(rng.standard_normal((B, Te, D)), jnp.float32)
        enc_mask = jnp.ones((B, Te), bool)
        toks = greedy_translate(params, enc, enc_mask, cfg, max_len=16,
                                n_heads=2)
        assert toks.shape == (2, 16)
        assert int(toks.max()) <= 256  # byte ids + blank only

    def test_greedy_matches_teacher_forcing(self, rng):
        """Greedy with KV cache must equal argmax of teacher-forced logits
        over its own prefix."""
        cfg, params = setup()
        B, Te, D = 1, 8, cfg.encoder.d_model
        enc = jnp.asarray(rng.standard_normal((B, Te, D)), jnp.float32)
        enc_mask = jnp.ones((B, Te), bool)
        L = 6
        toks = np.asarray(greedy_translate(params, enc, enc_mask, cfg,
                                           max_len=L, n_heads=2))[0]
        # replay: feed [BOS, toks[:-1]] teacher-forced, compare argmax
        inp = jnp.asarray(np.concatenate([[0], toks[:-1]])[None, :],
                          jnp.int32)
        logits = decoder_forward(params, inp, enc, enc_mask, cfg, n_heads=2)
        replay = np.asarray(
            jnp.argmax(logits[0, :, : 1 + cfg.vocab.n_bytes], axis=-1))
        # compare until first EOS in greedy output
        for i in range(L):
            assert replay[i] == toks[i], (i, replay, toks)
            if toks[i] == 0:
                break

    def test_tokens_to_text(self):
        cfg, _ = setup()
        ids = [cfg.vocab.byte_to_id(b) for b in "hi".encode()] + [0, 99]
        assert tokens_to_text(ids, cfg.vocab) == "hi"

    def test_spec_tree_matches_params(self):
        cfg, params = setup()
        specs = translator_specs(n_layers=2)
        pt = jax.tree.structure(params)
        st = jax.tree.structure(
            specs, is_leaf=lambda x: not isinstance(x, (dict, list)))
        assert pt == st


class TestLoadedParamsDecode:
    """Decoder params loaded from EITHER checkpoint format must drive the
    greedy decode scan: numpy leaves raise TracerArrayConversionError when
    the embed table is indexed by a traced token id (regression: first
    shipped translator.npz + eval_heads --translator orbax path)."""

    def test_orbax_and_npz_roundtrip_decode(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from omnilingual_asr_tpu.config import tiny_config
        from omnilingual_asr_tpu.models.translation import (
            greedy_translate,
            load_translator,
            save_translator,
            translator_init,
        )
        from omnilingual_asr_tpu.models.zoo import save_release

        cfg = tiny_config()
        params = translator_init(jax.random.PRNGKey(0), cfg, 2)
        enc = jnp.zeros((1, 8, cfg.encoder.d_model))
        mask = jnp.ones((1, 8), bool)

        save_translator(tmp_path / "orbax_ckpt", params)
        back = load_translator(tmp_path / "orbax_ckpt", cfg, n_layers=2)
        toks = greedy_translate(back, enc, mask, cfg, max_len=4, n_heads=2)
        assert toks.shape == (1, 4)

        save_release(tmp_path / "rel.npz", params)
        back2 = load_translator(tmp_path / "rel.npz", cfg, n_layers=2)
        toks2 = greedy_translate(back2, enc, mask, cfg, max_len=4, n_heads=2)
        assert toks2.shape == (1, 4)

    def test_positionless_orbax_checkpoint_gets_zero_pos(self, tmp_path):
        """Pre-'pos' Orbax checkpoints restore against the positionless
        template and get a zeros table injected. The pos-presence decision
        reads the on-disk metadata — the earlier exception-driven fallback
        masked unrelated restore failures (e.g. cross-backend shardings) as
        structure mismatches (round-3 session-4 stage-E failure)."""
        import jax
        import numpy as np

        from omnilingual_asr_tpu.config import tiny_config
        from omnilingual_asr_tpu.models.translation import (
            load_translator,
            save_translator,
            translator_init,
        )

        cfg = tiny_config()
        params = dict(translator_init(jax.random.PRNGKey(1), cfg, 2))
        old_style = {k: v for k, v in params.items() if k != "pos"}
        save_translator(tmp_path / "old_ckpt", old_style)

        back = load_translator(tmp_path / "old_ckpt", cfg, n_layers=2)
        assert set(back) == set(params)
        assert np.all(np.asarray(back["pos"]) == 0.0)
        np.testing.assert_array_equal(
            np.asarray(back["embed"]), np.asarray(params["embed"]))


class TestPositionalEncoding:
    """The decoder must know WHERE each history token sits (round-3 root
    cause: order-blind history degenerated fine-tunes to 'the the the')."""

    def test_history_order_changes_logits(self, rng):
        cfg, params = setup()
        # make positions non-zero (zeros-init keeps back-compat)
        params = dict(params)
        params["pos"] = jnp.asarray(
            rng.standard_normal(params["pos"].shape), jnp.float32) * 0.1
        B, Te, D = 1, 8, cfg.encoder.d_model
        enc = jnp.asarray(rng.standard_normal((B, Te, D)), jnp.float32)
        enc_mask = jnp.ones((B, Te), bool)
        a, b = 17, 43
        t1 = jnp.asarray([[0, a, b, 5]], jnp.int32)
        t2 = jnp.asarray([[0, b, a, 5]], jnp.int32)
        l1 = decoder_forward(params, t1, enc, enc_mask, cfg, n_heads=2)
        l2 = decoder_forward(params, t2, enc, enc_mask, cfg, n_heads=2)
        # last position sees permuted history -> logits must differ
        assert not np.allclose(np.asarray(l1[0, -1]), np.asarray(l2[0, -1]),
                               atol=1e-6)

    def test_greedy_applies_same_positions(self, rng):
        """KV-cache decode must replay teacher-forced logits with a
        non-zero positional table too."""
        cfg, params = setup()
        params = dict(params)
        params["pos"] = jnp.asarray(
            rng.standard_normal(params["pos"].shape), jnp.float32) * 0.1
        B, Te, D = 1, 8, cfg.encoder.d_model
        enc = jnp.asarray(rng.standard_normal((B, Te, D)), jnp.float32)
        enc_mask = jnp.ones((B, Te), bool)
        L = 6
        toks = np.asarray(greedy_translate(params, enc, enc_mask, cfg,
                                           max_len=L, n_heads=2))[0]
        inp = jnp.asarray(np.concatenate([[0], toks[:-1]])[None, :],
                          jnp.int32)
        logits = decoder_forward(params, inp, enc, enc_mask, cfg, n_heads=2)
        replay = np.asarray(
            jnp.argmax(logits[0, :, : 1 + cfg.vocab.n_bytes], axis=-1))
        for i in range(L):
            assert replay[i] == toks[i], (i, replay, toks)
            if toks[i] == 0:
                break

    def test_positionless_checkpoint_back_compat(self, tmp_path, rng):
        """Pre-round-3 checkpoints (no 'pos' leaf) load with an injected
        zeros table and reproduce the old forward exactly."""
        from omnilingual_asr_tpu.models.translation import (
            load_translator,
            save_translator,
        )
        from omnilingual_asr_tpu.models.zoo import save_release

        cfg, params = setup()
        old = dict(params)
        old.pop("pos")  # what a pre-pos checkpoint contains

        save_translator(tmp_path / "old_orbax", old)
        back = load_translator(tmp_path / "old_orbax", cfg, n_layers=2)
        assert float(jnp.abs(back["pos"]).max()) == 0.0

        save_release(tmp_path / "old.npz", old)
        back2 = load_translator(tmp_path / "old.npz", cfg, n_layers=2)
        assert float(jnp.abs(back2["pos"]).max()) == 0.0

        B, Te, D = 1, 8, cfg.encoder.d_model
        enc = jnp.asarray(rng.standard_normal((B, Te, D)), jnp.float32)
        enc_mask = jnp.ones((B, Te), bool)
        toks = jnp.asarray([[0, 17, 43, 5]], jnp.int32)
        l_old = decoder_forward(old, toks, enc, enc_mask, cfg, n_heads=2)
        l_new = decoder_forward(back, toks, enc, enc_mask, cfg, n_heads=2)
        np.testing.assert_allclose(np.asarray(l_old), np.asarray(l_new),
                                   atol=1e-5)
