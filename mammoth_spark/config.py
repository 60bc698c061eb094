"""Layered configuration (A25 config_load).

Mirrors the reference's viper setup — defaults, then a YAML file, then
environment variables, with validation (reference config/config.go:47-140;
env bindings like SYNC_BATCHMAXITEMS via reflection at :121-139). Here:
dataclass defaults -> YAML -> ``MAMMOTH_<SECTION>_<FIELD>`` env vars.
"""

from __future__ import annotations

import os
from dataclasses import asdict, dataclass, field, fields


@dataclass
class SyncConfig:
    # defaults mirror config.go:46-58 / default-config.yml
    batch_max_items: int = 25_000
    batch_timeout_seconds: int = 60
    tables: list[str] = field(default_factory=list)


@dataclass
class SourceConfig:
    change_log_dir: str = ""
    snapshot_dir: str = ""
    standby_message_interval_seconds: int = 10


@dataclass
class TargetConfig:
    root_dir: str = ""
    rows_per_file: int = 20_000


@dataclass
class EngineConfig:
    sync: SyncConfig = field(default_factory=SyncConfig)
    source: SourceConfig = field(default_factory=SourceConfig)
    target: TargetConfig = field(default_factory=TargetConfig)

    def validate(self) -> None:
        """Hard validation, reference config.go:91-107 style."""
        errors = []
        if self.sync.batch_max_items <= 0:
            errors.append("sync.batch_max_items must be positive")
        if self.sync.batch_timeout_seconds <= 0:
            errors.append("sync.batch_timeout_seconds must be positive")
        if not self.sync.tables:
            errors.append("sync.tables must list at least one table")
        if not self.target.root_dir:
            errors.append("target.root_dir is required")
        if errors:
            raise ValueError("invalid config: " + "; ".join(errors))


ENV_PREFIX = "MAMMOTH"


def _apply_env(cfg: EngineConfig) -> None:
    for section_field in fields(cfg):
        section = getattr(cfg, section_field.name)
        for f in fields(section):
            env_key = f"{ENV_PREFIX}_{section_field.name}_{f.name}".upper()
            raw = os.environ.get(env_key)
            if raw is None:
                continue
            if f.type in ("int", int):
                setattr(section, f.name, int(raw))
            elif f.type in ("list[str]",):
                setattr(section, f.name, [s for s in raw.split(",") if s])
            else:
                setattr(section, f.name, raw)


def load_config(path: str | None = None) -> EngineConfig:
    """defaults -> YAML file -> env vars (later layers win)."""
    cfg = EngineConfig()
    if path and os.path.exists(path):
        import yaml

        with open(path) as fh:
            data = yaml.safe_load(fh) or {}
        for section_name, values in data.items():
            section = getattr(cfg, section_name, None)
            if section is None or not isinstance(values, dict):
                continue
            for k, v in values.items():
                if hasattr(section, k):
                    setattr(section, k, v)
    _apply_env(cfg)
    return cfg


def write_example_config(path: str) -> None:
    """A25 / `mammoth initconfig` (config.go:109-119): serialize defaults."""
    import yaml

    cfg = EngineConfig()
    cfg.sync.tables = ["public.users"]
    cfg.target.root_dir = "/data/mammoth-target"
    with open(path, "w") as fh:
        yaml.safe_dump(asdict(cfg), fh, sort_keys=False)
