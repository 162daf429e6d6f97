"""Reconstruct a trainer-format trunk from the committed release npz.

The training checkpoints live outside git (only ``checkpoints/release`` is
committed), so a fresh machine has no ``--resume-from``-able trunk. This tool
inverts ``tools/make_release.py``: it loads the float16 release weights and
re-saves them in the Orbax layout the trainer resumes from
(``<out>/asr`` + ``<out>/translator`` + ``config.json``).

Heads absent from the release (translator when the ship-gate failed) are
seeded random-init — fine: the queue's fine-tune stages train them anyway.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python tools/seed_from_release.py --out checkpoints/r3_d256x4c/best
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--release", default="checkpoints/release")
    ap.add_argument("--out", default="checkpoints/r3_d256x4c/best")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from omnilingual_asr_tpu.config import config_for_checkpoint
    from omnilingual_asr_tpu.models.translation import (load_translator,
                                                        save_translator,
                                                        translator_init)
    from omnilingual_asr_tpu.models.zoo import load_checkpoint, save_checkpoint

    rel = Path(args.release)
    out = Path(args.out)
    cfg = config_for_checkpoint(str(rel)).replace(checkpoint_path=None)

    asr = load_checkpoint(rel / "asr.npz", cfg)
    save_checkpoint(out / "asr", asr)

    if (rel / "translator.npz").exists():
        trans = load_translator(rel / "translator.npz", cfg)
    else:
        trans = translator_init(jax.random.PRNGKey(7), cfg, 4)
        print("release has no translator.npz -> random-init seed")
    save_translator(out / "translator", trans)

    # The summarizer must ride along too: eval_heads only scores summary
    # facts when handed an explicit --summarizer dir, and the eval queue
    # points it at <out>/summarizer (a missing dir silently drops the
    # summary rows from the round's heads artifact).
    if (rel / "summarizer.npz").exists():
        summ = load_translator(rel / "summarizer.npz", cfg, n_layers=2)
        save_translator(out / "summarizer", summ)
    else:
        print("release has no summarizer.npz -> no summarizer seed")

    (out / "config.json").write_text(cfg.to_json())
    print(f"seeded trainer trunk at {out}")


if __name__ == "__main__":
    main()
