"""Pluggable metric loggers.

The reference's observability was Lightning ``self.log`` + commented-out
MLflow calls (reference ddpm.py:348-354, conda.yml:10 — MLflow was a
declared dependency that no live code path used). Here logging is a small
protocol so experiment trackers can be attached without touching the
Trainer: each logger receives every metrics record (a flat JSON-able dict)
and lifecycle events.

Built-ins: stdout (pretty one-liners), jsonl (append to metrics.jsonl — the
machine-readable record), csv, and mlflow (activates only when the mlflow
package is importable; otherwise constructing it raises with instructions —
nothing in the default path imports it).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Protocol

from rho_diffusion_tpu.registry import registry

__all__ = [
    "Logger",
    "StdoutLogger",
    "JSONLLogger",
    "CSVLogger",
    "MLflowLogger",
    "build_loggers",
]


class Logger(Protocol):
    """One metrics sink. ``record`` is a flat dict of JSON-able values."""

    def log(self, record: dict[str, Any]) -> None: ...

    def close(self) -> None: ...


@registry.register_logger("stdout")
class StdoutLogger:
    def log(self, record: dict[str, Any]) -> None:
        pretty = " ".join(
            f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in record.items()
        )
        print(pretty, flush=True)

    def close(self) -> None:
        pass


@registry.register_logger("jsonl")
class JSONLLogger:
    def __init__(self, path: str | Path = "metrics.jsonl") -> None:
        self.path = Path(path)
        self._f = None

    def log(self, record: dict[str, Any]) -> None:
        if self._f is None:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            self._f = open(self.path, "a")
        self._f.write(json.dumps(record) + "\n")
        self._f.flush()

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
            self._f = None


@registry.register_logger("csv")
class CSVLogger:
    """Append records to a CSV whose header is the union of all keys seen.

    Trainer records are heterogeneous (lifecycle events like ``{event, step}``
    arrive before the first metrics row), so the header cannot be frozen to
    the first record's keys: when a record introduces new keys the file is
    rewritten once with the widened header. Only the header lives in memory —
    rewrites stream the existing file through a temp file, so a long run's
    memory stays constant no matter how many rows were logged. Missing keys
    render as empty cells.
    """

    def __init__(self, path: str | Path = "metrics.csv") -> None:
        self.path = Path(path)
        self._fields: list[str] = []
        self._loaded = False

    def _load_existing(self) -> None:
        """Adopt a previous run's header so a preempted-and-resumed process
        appends instead of truncating the metrics history."""
        self._loaded = True
        if not self.path.exists():
            return
        import csv

        with open(self.path, newline="") as f:
            reader = csv.DictReader(f)
            if reader.fieldnames:
                self._fields = list(reader.fieldnames)

    def log(self, record: dict[str, Any]) -> None:
        if not self._loaded:
            self._load_existing()
        new_keys = [k for k in record if k not in self._fields]
        if new_keys:
            old_fields = list(self._fields)
            self._fields.extend(new_keys)
            self._rewiden(old_fields)
        self._append(record)

    def _rewiden(self, old_fields: list[str]) -> None:
        """Rewrite the file with the widened header, streaming row by row."""
        import csv
        import os
        import tempfile

        self.path.parent.mkdir(parents=True, exist_ok=True)
        fd, tmp = tempfile.mkstemp(
            dir=str(self.path.parent), suffix=".csv.tmp",
        )
        with os.fdopen(fd, "w", newline="") as out:
            w = csv.DictWriter(out, fieldnames=self._fields, restval="")
            w.writeheader()
            if old_fields and self.path.exists():
                with open(self.path, newline="") as f:
                    for row in csv.DictReader(f):
                        w.writerow({k: v for k, v in row.items() if v != ""})
        os.replace(tmp, self.path)

    def _append(self, record: dict[str, Any]) -> None:
        import csv

        self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "a", newline="") as f:
            csv.DictWriter(f, fieldnames=self._fields, restval="").writerow(record)

    def close(self) -> None:
        # a later log() re-adopts the on-disk header
        self._fields = []
        self._loaded = False


@registry.register_logger("mlflow")
class MLflowLogger:
    """MLflow tracker (the reference declared mlflow but never wired it).

    Requires the ``mlflow`` package; numeric values become metrics (stepped
    by the record's "step" when present), strings become tags.
    """

    def __init__(self, experiment: str = "rho_diffusion_tpu", **kwargs) -> None:
        try:
            import mlflow
        except ImportError as e:  # pragma: no cover - mlflow not in image
            raise ImportError(
                "MLflowLogger requires the 'mlflow' package "
                "(pip install mlflow), which is not installed.",
            ) from e
        self._mlflow = mlflow
        mlflow.set_experiment(experiment)
        self._run = mlflow.start_run(**kwargs)

    def log(self, record: dict[str, Any]) -> None:  # pragma: no cover
        step = record.get("step")
        metrics = {
            k: float(v) for k, v in record.items()
            if isinstance(v, (int, float)) and k != "step"
        }
        if metrics:
            self._mlflow.log_metrics(metrics, step=step)
        for k, v in record.items():
            if isinstance(v, str):
                self._mlflow.set_tag(k, v)

    def close(self) -> None:  # pragma: no cover
        self._mlflow.end_run()


def build_loggers(specs, work_dir: str | Path) -> list:
    """Resolve logger specs — names ("jsonl"), (name, kwargs) pairs, or
    ready Logger instances — against the registry. File-backed loggers
    default their paths into ``work_dir``."""
    work_dir = Path(work_dir)
    defaults = {
        "jsonl": {"path": work_dir / "metrics.jsonl"},
        "csv": {"path": work_dir / "metrics.csv"},
    }
    out = []
    for spec in specs:
        if hasattr(spec, "log"):
            out.append(spec)
            continue
        if isinstance(spec, str):
            name, kwargs = spec, {}
        elif isinstance(spec, dict):
            # the ComponentConfig shape used everywhere else in the JSON
            # config ({"name": ..., "kwargs": {...}})
            name, kwargs = spec["name"], spec.get("kwargs") or {}
        else:
            name, kwargs = spec
        kwargs = {**defaults.get(name, {}), **kwargs}
        out.append(registry.get("loggers", name)(**kwargs))
    return out
