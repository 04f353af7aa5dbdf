"""hexpyro command-line interface.

Subcommands (SURVEY.md section 7): sample / simulate / fit-seed / train-crnn /
train-temp-mlp / train-time-mlp / deploy / bench. Every command takes
`--config cfg.toml` plus individual overrides; run
`python -m hexpyro.cli <cmd> --help` for the full list.

Example end-to-end (JetSurf, isothermal, small smoke sweep):
  python -m hexpyro.cli sample   --mechanism JetSurf --n-cases 32
  python -m hexpyro.cli simulate --mechanism JetSurf --n-cases 32 --chunk-size 8
  python -m hexpyro.cli train-crnn --mechanism JetSurf --n-cases 32 --epochs 20
"""

from __future__ import annotations

import argparse
import dataclasses

from .pipeline.config import PipelineConfig


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", help="TOML config file")
    p.add_argument("--mechanism", choices=["JetSurf", "LLNL", "NUIGMech1.1"])
    p.add_argument("--mech-dir", dest="mech_dir")
    p.add_argument("--energy-on", dest="energy_on", action="store_const", const=True)
    p.add_argument("--wide", action="store_const", const=True)
    p.add_argument("--dims", type=int, choices=[2, 4])
    p.add_argument("--n-cases", dest="n_cases", type=int)
    p.add_argument("--seed", type=int)
    p.add_argument("--n-steps", dest="n_steps", type=int)
    p.add_argument("--out-root", dest="out_root")
    p.add_argument("--chunk-size", dest="chunk_size", type=int)
    p.add_argument("--window", type=int,
                   help="segments per device execution (0 = one scan)")
    p.add_argument("--dtype", choices=["f64", "f32"])
    p.add_argument("--no-rescue", dest="rescue", action="store_const", const=False,
                   help="skip the f64 re-solve of high-residual cases")
    p.add_argument("--epochs", type=int)
    p.add_argument("--batch-size", dest="batch_size", type=int)
    p.add_argument("--learning-rate", dest="learning_rate", type=float)


def _config_from_args(args) -> PipelineConfig:
    fields = {f.name for f in dataclasses.fields(PipelineConfig)}
    overrides = {k: v for k, v in vars(args).items() if k in fields and v is not None}
    if args.config:
        return PipelineConfig.from_toml(args.config, **overrides)
    return PipelineConfig().with_overrides(**overrides)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="hexpyro")
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name in (
        "sample",
        "simulate",
        "fit-seed",
        "train-crnn",
        "train-temp-mlp",
        "train-time-mlp",
        "deploy",
        "eval-temp-mlp",
        "eval-time-mlp",
        "validate",
    ):
        sp = sub.add_parser(name)
        _add_common(sp)
        if name == "train-crnn":
            sp.add_argument("--temp-mlp-dir", dest="temp_mlp_dir")
            sp.add_argument("--polish", action="store_true",
                            help="full-batch L-BFGS finish after AdamW")
        if name == "deploy":
            sp.add_argument("--crnn-npz", dest="crnn_npz", required=True)
            sp.add_argument("--time-mlp-dir", dest="time_mlp_dir", required=True)
            sp.add_argument("--temp-mlp-dir", dest="temp_mlp_dir")
            sp.add_argument("--dataset-dir", dest="dataset_dir",
                            help="truth dir for an independent evaluation set")
            sp.add_argument("--cases-csv", dest="cases_csv",
                            help="cases CSV for an independent evaluation set")
            sp.add_argument("--eval-tag", dest="eval_tag", default="",
                            help="suffix for metric/prediction outputs")
            sp.add_argument("--no-predictions", dest="no_predictions",
                            action="store_true")
        if name.startswith("eval-"):
            sp.add_argument("--mlp-dir", dest="mlp_dir")
        if name == "validate":
            sp.add_argument("--crnn-npz-a", required=True)
            sp.add_argument("--crnn-npz-b", required=True)
            sp.add_argument("--time-mlp-dir-a", required=True)
            sp.add_argument("--time-mlp-dir-b", required=True)
            sp.add_argument("--mech-a", required=True)
            sp.add_argument("--mech-b", required=True)
            sp.add_argument("--temp-mlp-dir-a")
            sp.add_argument("--temp-mlp-dir-b")
            sp.add_argument("--dataset-dir-a",
                            help="truth trajectory dir for model A overlays")
            sp.add_argument("--dataset-dir-b")
            sp.add_argument("--geometry-txt", dest="geometry_txt",
                            help="per-case (L, u0) sidecar, reference "
                                 "4D_valid/reactor_geometry.txt flow")
            sp.add_argument("--picker", choices=["sweep", "reference-valid"],
                            default="sweep")
            sp.add_argument("--fig-path", dest="fig_path")

    args = parser.parse_args(argv)
    cfg = _config_from_args(args)

    from .pipeline import stages

    if args.cmd == "sample":
        print(stages.stage_sample(cfg))
    elif args.cmd == "simulate":
        stages.stage_simulate(cfg)
    elif args.cmd == "fit-seed":
        stages.stage_fit_seed(cfg)
    elif args.cmd == "train-crnn":
        stages.stage_train_crnn(cfg, temp_mlp_dir=args.temp_mlp_dir,
                                polish=args.polish)
    elif args.cmd == "train-temp-mlp":
        stages.stage_train_profile_mlp(cfg, "temp")
    elif args.cmd == "train-time-mlp":
        stages.stage_train_profile_mlp(cfg, "time")
    elif args.cmd == "deploy":
        stages.stage_deploy(
            cfg, args.crnn_npz, args.time_mlp_dir, temp_mlp_dir=args.temp_mlp_dir,
            dataset_dir=args.dataset_dir, cases_csv=args.cases_csv,
            save_predictions=not args.no_predictions, eval_tag=args.eval_tag,
        )
    elif args.cmd == "eval-temp-mlp":
        stages.stage_eval_mlp(cfg, "temp", mlp_dir=args.mlp_dir)
    elif args.cmd == "eval-time-mlp":
        stages.stage_eval_mlp(cfg, "time", mlp_dir=args.mlp_dir)
    elif args.cmd == "validate":
        stages.stage_validate(
            cfg, args.crnn_npz_a, args.crnn_npz_b,
            args.time_mlp_dir_a, args.time_mlp_dir_b, args.mech_a, args.mech_b,
            temp_mlp_dirs=(args.temp_mlp_dir_a, args.temp_mlp_dir_b),
            dataset_dirs=(args.dataset_dir_a, args.dataset_dir_b),
            geometry_txt=args.geometry_txt, picker=args.picker,
            fig_path=args.fig_path,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
