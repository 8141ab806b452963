"""Hierarchical metrics logger with accumulate-means contexts.

Re-implementation of the reference's ``HierarchicalLogger``
(reference: src/imitation/util/logger.py:71-342) without the SB3 dependency:

* ``record(key, value)`` writes to the active context. Inside an
  ``accumulate_means(name)`` context, raw values go to a per-context
  sub-logger (``raw/{name}/...`` directory on disk) while running means
  accumulate into ``mean/{name}/{key}`` of the default logger, flushed at the
  next default ``dump`` — exactly the reference's two-tier semantics
  (logger.py:161-288).
* ``add_key_prefix`` / ``add_accumulate_prefix`` context managers.
* Output formats: stdout (pretty table), CSV, JSON-lines, TensorBoard
  (via tensorboardX when available), W&B (when available).

Used by every algorithm via ``custom_logger`` injection, mirroring the
reference's L4 observability layer.
"""

from __future__ import annotations

import contextlib
import csv
import datetime
import json
import os
import sys
import tempfile
from collections import defaultdict
from typing import Any, Dict, List, Optional, Sequence, TextIO, Union


class KVWriter:
    def write(self, kvs: Dict[str, Any], step: int) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass


class HumanOutputFormat(KVWriter):
    def __init__(self, file: TextIO = sys.stdout):
        self.file = file

    def write(self, kvs: Dict[str, Any], step: int) -> None:
        if not kvs:
            return
        key2str = {}
        for k, v in sorted(kvs.items()):
            vs = f"{v:.3g}" if isinstance(v, float) else str(v)
            key2str[self._trunc(k)] = self._trunc(vs)
        keywidth = max(map(len, key2str.keys()))
        valwidth = max(map(len, key2str.values()))
        dashes = "-" * (keywidth + valwidth + 7)
        lines = [dashes]
        for k, v in key2str.items():
            lines.append(f"| {k}{' ' * (keywidth - len(k))} | {v}{' ' * (valwidth - len(v))} |")
        lines.append(dashes)
        self.file.write("\n".join(lines) + "\n")
        self.file.flush()

    @staticmethod
    def _trunc(s: str, maxlen: int = 40) -> str:
        return s[: maxlen - 3] + "..." if len(s) > maxlen else s


class CSVOutputFormat(KVWriter):
    def __init__(self, filename: str):
        self.filename = filename
        self.keys: List[str] = []
        self.file = open(filename, "w", newline="")
        self.writer = None

    def write(self, kvs: Dict[str, Any], step: int) -> None:
        extra = [k for k in sorted(kvs.keys()) if k not in self.keys]
        if extra:
            self.keys.extend(extra)
            # rewrite header + pad existing rows
            self.file.close()
            old_rows = []
            with open(self.filename, newline="") as f:
                reader = csv.reader(f)
                rows = list(reader)
                if rows:
                    old_header, old_rows = rows[0], rows[1:]
                else:
                    old_header = []
            self.file = open(self.filename, "w", newline="")
            writer = csv.writer(self.file)
            writer.writerow(self.keys)
            for row in old_rows:
                mapping = dict(zip(old_header, row))
                writer.writerow([mapping.get(k, "") for k in self.keys])
        writer = csv.writer(self.file)
        writer.writerow([kvs.get(k, "") for k in self.keys])
        self.file.flush()

    def close(self) -> None:
        self.file.close()


class JSONOutputFormat(KVWriter):
    def __init__(self, filename: str):
        self.file = open(filename, "w")

    def write(self, kvs: Dict[str, Any], step: int) -> None:
        rec = dict(kvs)
        rec["_step"] = step
        self.file.write(json.dumps(rec, default=float) + "\n")
        self.file.flush()

    def close(self) -> None:
        self.file.close()


class TensorBoardOutputFormat(KVWriter):
    def __init__(self, folder: str):
        from tensorboardX import SummaryWriter

        self.writer = SummaryWriter(folder)

    def write(self, kvs: Dict[str, Any], step: int) -> None:
        for k, v in kvs.items():
            if isinstance(v, (int, float)):
                self.writer.add_scalar(k, v, step)

    def close(self) -> None:
        self.writer.close()


class WandbOutputFormat(KVWriter):
    """W&B output (reference logger.py:345-384); requires wandb.init() done."""

    def __init__(self):
        try:
            import wandb
        except ModuleNotFoundError as e:
            raise ModuleNotFoundError(
                "Trying to log data with `wandb` but `wandb` not installed."
            ) from e
        self.wandb = wandb

    def write(self, kvs: Dict[str, Any], step: int) -> None:
        self.wandb.log(dict(kvs), step=step)


def make_output_format(fmt: str, folder: str) -> KVWriter:
    os.makedirs(folder, exist_ok=True)
    if fmt == "stdout":
        return HumanOutputFormat(sys.stdout)
    if fmt == "log":
        return HumanOutputFormat(open(os.path.join(folder, "log.txt"), "w"))
    if fmt == "csv":
        return CSVOutputFormat(os.path.join(folder, "progress.csv"))
    if fmt == "json":
        return JSONOutputFormat(os.path.join(folder, "progress.json"))
    if fmt == "tensorboard":
        return TensorBoardOutputFormat(folder)
    if fmt == "wandb":
        return WandbOutputFormat()
    raise ValueError(f"Unknown format: {fmt}")


class _Logger:
    """A flat key-value logger instance (one output dir + formats)."""

    def __init__(self, folder: Optional[str], output_formats: Sequence[KVWriter]):
        self.dir = folder
        self.output_formats = list(output_formats)
        self.name_to_value: Dict[str, Any] = {}
        self.name_to_count: Dict[str, int] = defaultdict(int)
        self.name_to_excluded: Dict[str, Any] = {}

    def record(self, key: str, value: Any, exclude=None) -> None:
        self.name_to_value[key] = value

    def record_mean(self, key: str, value: Any) -> None:
        old, cnt = self.name_to_value.get(key, 0.0), self.name_to_count[key]
        self.name_to_value[key] = (old * cnt + value) / (cnt + 1)
        self.name_to_count[key] = cnt + 1

    def dump(self, step: int = 0) -> None:
        for fmt in self.output_formats:
            fmt.write(dict(self.name_to_value), step)
        self.name_to_value.clear()
        self.name_to_count.clear()

    def close(self) -> None:
        for fmt in self.output_formats:
            fmt.close()

    def warn(self, msg: str) -> None:
        print(f"WARNING: {msg}", file=sys.stderr)

    def info(self, msg: str) -> None:
        print(msg)


class HierarchicalLogger:
    """Two-tier logger with accumulate_means contexts (reference logger.py:71-342)."""

    def __init__(
        self,
        default_logger: _Logger,
        format_strs: Sequence[str] = ("stdout",),
    ):
        self.default_logger = default_logger
        self._cached_loggers: Dict[str, _Logger] = {}
        self._accumulate_prefixes: List[str] = []
        self._key_prefixes: List[str] = []
        self._subdir: Optional[str] = None
        self._name: Optional[str] = None
        self.format_strs = list(format_strs)
        self.current_logger: Optional[_Logger] = None

    # -- context managers --------------------------------------------------
    @contextlib.contextmanager
    def accumulate_means(self, name: str):
        """Temporarily redirect record() to a sub-logger for ``name``.

        Raw values go to ``raw/{prefixes}/{name}``; means accumulate into the
        default logger under ``mean/{prefixes}/{name}/...`` and flush at the
        next default dump (reference logger.py:161-245).
        """
        if self.current_logger is not None:
            raise RuntimeError("Nested `accumulate_means` context")
        subdir = os.path.join("raw", *self._accumulate_prefixes, name)
        if subdir in self._cached_loggers:
            logger = self._cached_loggers[subdir]
        else:
            if self.default_logger.dir is not None:
                folder = os.path.join(self.default_logger.dir, subdir)
                os.makedirs(folder, exist_ok=True)
                fmts = [make_output_format(f, folder) for f in self.format_strs]
            else:
                fmts = []
            logger = _Logger(folder if self.default_logger.dir else None, fmts)
            self._cached_loggers[subdir] = logger
        try:
            self.current_logger = logger
            self._subdir = subdir
            self._name = name
            yield
        finally:
            self.current_logger = None
            self._subdir = None
            self._name = None

    @contextlib.contextmanager
    def add_accumulate_prefix(self, prefix: str):
        """Prefix future accumulate_means names (reference logger.py:247-266)."""
        if self.current_logger is not None:
            raise RuntimeError(
                "Cannot add accumulate prefix when inside an accumulate_means context"
            )
        self._accumulate_prefixes.append(prefix)
        try:
            yield self
        finally:
            self._accumulate_prefixes.pop()

    @contextlib.contextmanager
    def add_key_prefix(self, prefix: str):
        """Prefix all recorded keys (reference logger.py:268-288)."""
        self._key_prefixes.append(prefix)
        try:
            yield self
        finally:
            self._key_prefixes.pop()

    # -- recording ---------------------------------------------------------
    def record(self, key: str, value: Any, exclude=None) -> None:
        key = "/".join([*self._key_prefixes, key])
        if self.current_logger is not None:
            assert self._subdir is not None
            raw_key = "/".join([self._subdir, key])
            self.current_logger.record(raw_key, value)
            mean_key = "/".join(
                ["mean", *self._accumulate_prefixes, str(self._name), key]
            )
            self.default_logger.record_mean(mean_key, value)
        else:
            self.default_logger.record(key, value)

    def record_mean(self, key: str, value: Any) -> None:
        key = "/".join([*self._key_prefixes, key])
        target = self.current_logger or self.default_logger
        target.record_mean(key, value)

    def dump(self, step: int = 0) -> None:
        if self.current_logger is not None:
            self.current_logger.dump(step)
        else:
            self.default_logger.dump(step)

    @property
    def dir(self) -> Optional[str]:
        return self.default_logger.dir

    def close(self) -> None:
        self.default_logger.close()
        for logger in self._cached_loggers.values():
            logger.close()

    def warn(self, msg: str) -> None:
        self.default_logger.warn(msg)

    def info(self, msg: str) -> None:
        self.default_logger.info(msg)


def configure(
    folder: Optional[str] = None,
    format_strs: Optional[Sequence[str]] = None,
) -> HierarchicalLogger:
    """Builds a HierarchicalLogger (reference logger.py:387-417).

    With no folder, logs to a timestamped temp dir with stdout only.
    """
    if folder is None:
        now = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        folder = os.path.join(tempfile.gettempdir(), "imitation_tpu", now)
    if format_strs is None:
        format_strs = ["stdout"]
    os.makedirs(folder, exist_ok=True)
    fmts = [make_output_format(f, folder) for f in format_strs]
    default = _Logger(folder, fmts)
    return HierarchicalLogger(default, format_strs=format_strs)
