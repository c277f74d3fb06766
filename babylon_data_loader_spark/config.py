"""Engine configuration from environment variables.

Mirrors the env-var surface of the reference loader (reference
config/loadConfig.go:15-34,37-83): CSV input dirs, processed-file
archival, and a run timeout — extended with the lake root the Spark
engine writes to.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env_bool(name: str, default: bool = False) -> bool:
    raw = os.environ.get(name)
    if raw is None:
        return default
    return raw.strip().lower() in {"1", "true", "yes", "on"}


@dataclass(frozen=True)
class EngineConfig:
    """Runtime configuration for the ingest/query engine.

    Field ↔ reference env var (config/loadConfig.go):
      unprocessed_dir ↔ UNPROCESSED_DIR (falls back to CSV_DIR)
      processed_dir   ↔ PROCESSED_DIR
      move_processed_files ↔ MOVE_PROCESSED_FILES
      timeout_seconds ↔ default 30s app timeout (loadConfig.go:16)
      lake_dir        — new: parquet lake root (replaces MONGO_URI)
    """

    unprocessed_dir: str = field(
        default_factory=lambda: os.environ.get(
            "UNPROCESSED_DIR", os.environ.get("CSV_DIR", "./data/unprocessed")
        )
    )
    processed_dir: str = field(
        default_factory=lambda: os.environ.get("PROCESSED_DIR", "./data/processed")
    )
    move_processed_files: bool = field(
        default_factory=lambda: _env_bool("MOVE_PROCESSED_FILES", False)
    )
    lake_dir: str = field(
        default_factory=lambda: os.environ.get("LAKE_DIR", "./lake")
    )
    timeout_seconds: int = field(
        default_factory=lambda: int(os.environ.get("INGEST_TIMEOUT_SECONDS", "30"))
    )

    @property
    def transactions_path(self) -> str:
        return os.path.join(self.lake_dir, "transactions")

    @property
    def sync_log_path(self) -> str:
        return os.path.join(self.lake_dir, "sync_log")


def load_config() -> EngineConfig:
    """Load config from the environment (reference LoadConfig)."""
    return EngineConfig()
