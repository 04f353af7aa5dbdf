"""Config system: one dataclass per pipeline, loadable from TOML + CLI overrides.

Replaces the reference's configuration-by-editing (module-level constants,
absolute Windows paths, comment-toggled mechanism blocks, e.g.
SURROGATE_MODEL_TRAINING/Eoff_surrogate_model_training.py:94-101) with explicit
keyed configuration {mechanism, energy mode, dims, ranges, paths}.
"""

from __future__ import annotations

import dataclasses
import tomllib


@dataclasses.dataclass
class PipelineConfig:
    # mechanism + mode
    mechanism: str = "JetSurf"  # JetSurf | LLNL | NUIGMech1.1
    mech_dir: str = "/root/reference/DETAILED_KINETIC_MODEL"
    energy_on: bool = False
    wide: bool = False  # wide T range [820, 1200] K

    # sweep definition
    dims: int = 2  # 2 -> (T, P); 4 -> (T, P, L, u0)
    n_cases: int = 800
    seed: int = 2024
    n_steps: int = 800

    # artifact locations
    out_root: str = "artifacts"
    # explicit trajectory directory, e.g. the shared 4D_valid validation
    # container where several mechanisms/modes live side by side (reference
    # VALIDATION_DATASET_CONTAINER/4D_valid); None -> derived from out_root
    dataset_dir_override: str | None = None

    # execution
    chunk_size: int = 16  # cases solved per jitted batch
    # segments per device execution: the axon TPU tunnel kills executions
    # running longer than ~1-2 min, so big-mechanism sweeps march in windows
    # (simulate_pfr_windowed); 0 = one monolithic scan
    window: int = 0
    dtype: str = "f64"  # f64 | f32
    x64: bool = True
    # re-solve cases whose worst segment residual exceeds the rescue threshold
    # at f64 with the conservative LU solver (stage_simulate)
    rescue: bool = True
    # stiffness-ordered batch composition: sort cases by T0 before chunking so
    # co-batched lanes converge together. The masked-lane batch refreshes the
    # Jacobian whenever ANY lane fails, so heterogeneous chunks make every
    # lane pay for the slowest (measured refreshes/segment grow 2.5x from
    # B=16 to B=64 on random composition, VALIDATION.md). Output files keep
    # their global case numbering either way.
    sort_by_T0: bool = False

    # training knobs (None -> module defaults)
    epochs: int | None = None
    batch_size: int | None = None
    learning_rate: float | None = None

    @property
    def mech_path(self) -> str:
        return f"{self.mech_dir}/{self.mechanism}.yaml"

    @property
    def mode(self) -> str:
        return "Eon" if self.energy_on else "Eoff"

    @property
    def dataset_dir(self) -> str:
        if self.dataset_dir_override:
            return self.dataset_dir_override
        tag = f"{self.dims}D_{'on' if self.energy_on else 'off'}"
        if self.wide:
            tag += "_wide"
        return f"{self.out_root}/datasets/{tag}"

    @property
    def cases_csv(self) -> str:
        wide = "_wide" if self.wide else ""
        return f"{self.out_root}/sampling_case{wide}_{self.dims}D.csv"

    @classmethod
    def from_toml(cls, path: str, **overrides) -> "PipelineConfig":
        with open(path, "rb") as f:
            data = tomllib.load(f)
        data.update({k: v for k, v in overrides.items() if v is not None})
        valid = {f.name for f in dataclasses.fields(cls)}
        unknown = set(data) - valid
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        return cls(**data)

    def with_overrides(self, **overrides) -> "PipelineConfig":
        return dataclasses.replace(
            self, **{k: v for k, v in overrides.items() if v is not None}
        )
