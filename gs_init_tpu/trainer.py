"""CLI entry point.

Usage (mirrors the reference trainer, trainer.py:14-96):

    python -m gs_init_tpu.trainer default --data_dir data/360_v2/garden \
        --result_dir results/garden --mdi.predictor=metric3d
    python -m gs_init_tpu.trainer mcmc --strategy.cap_max=6000000
    python -m gs_init_tpu.trainer default --ckpt=results/g/ckpts/ckpt_7000.npz

Presets: ``default`` (DefaultStrategy) and ``mcmc`` (MCMCStrategy with the
paired loss regularizers / init overrides the reference uses,
trainer.py:84-91).
"""
from __future__ import annotations

import logging
import sys

from .config import Config, DefaultStrategyConfig, MCMCStrategyConfig, parse_cli


def build_presets():
    default = Config(strategy=DefaultStrategyConfig())
    mcmc = Config(
        strategy=MCMCStrategyConfig(),
        init_opa=0.5,
        init_scale=0.1,
        opacity_reg=0.01,
        scale_reg=0.01,
    )
    return {"default": default, "mcmc": mcmc}


def run_with_config(cfg: Config):
    cfg.adjust_steps()
    from .engine.runner import Runner

    runner = Runner(cfg)
    if cfg.ckpt:
        # Eval-only restart (reference trainer.py:22-34) — but our checkpoint
        # carries optimizer/strategy state, so --resume continues training.
        step = runner.load(cfg.ckpt[0])
        runner.eval(step)
        runner.render_traj(step)
    else:
        runner.train()
    if not cfg.disable_viewer and not cfg.non_blocking_viewer:
        # Reference trainer.py:38-40: keep the viewer alive after training.
        import time

        print("Viewer running... Ctrl+C to exit.")
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            pass
    return runner


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        # Multi-host launch (one process per host, reference NCCL launcher
        # equivalent — SURVEY.md §5.8): join the distributed runtime before
        # any jax use.
        from .parallel.multihost import initialize_multihost

        pid, n = initialize_multihost()
        logging.info("multihost: process %d of %d", pid, n)
    cfg = parse_cli(
        argv if argv is not None else sys.argv[1:],
        build_presets(),
        default_preset=None,
    )
    return run_with_config(cfg)


if __name__ == "__main__":
    main()
