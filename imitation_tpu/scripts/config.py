"""Config system for the CLI scripts: Sacred-style UX without Sacred.

The reference builds its CLI on Sacred experiments + ingredients
(reference: src/imitation/scripts/, SURVEY §2.6): named configs per
environment, ``fast`` debug configs, dotted CLI overrides
(``python -m ... with cfg a.b=c``), auto-seeding, and a FileStorageObserver
writing ``config.json``/``run.json`` per run.

This module reproduces that UX on plain nested dicts:

* ``Experiment`` holds a default config (nested dict), named configs
  (partial dicts merged on request) and a ``main`` function.
* CLI grammar: ``script [command] [with] [named_config|key=value ...]`` —
  same shape as Sacred's.
* Each run writes ``config.json`` and ``run.json`` into a
  ``{log_root}/{script}/{env}/{timestamp}`` run dir (layout per reference
  ``ingredients/logging.py:30-56``), so the reference's output summarizers
  can parse our runs.
"""

from __future__ import annotations

import ast
import copy
import datetime
import json
import os
import sys
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence

from imitation_tpu.util import util
from imitation_tpu.util.logger import HierarchicalLogger, configure as configure_logger


def deep_update(base: Dict[str, Any], upd: Mapping[str, Any]) -> Dict[str, Any]:
    for k, v in upd.items():
        if isinstance(v, Mapping) and isinstance(base.get(k), dict):
            deep_update(base[k], v)
        else:
            base[k] = copy.deepcopy(v) if isinstance(v, (dict, list)) else v
    return base


def set_dotted(config: Dict[str, Any], dotted_key: str, value: Any) -> None:
    parts = dotted_key.split(".")
    node = config
    for p in parts[:-1]:
        node = node.setdefault(p, {})
        if not isinstance(node, dict):
            raise KeyError(f"cannot descend into non-dict at {p!r} for {dotted_key!r}")
    node[parts[-1]] = value


def parse_value(text: str) -> Any:
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        return text


class Experiment:
    """A configurable CLI experiment (Sacred-experiment equivalent)."""

    def __init__(self, name: str, default_config: Dict[str, Any]):
        self.name = name
        self.default_config = default_config
        self.named_configs: Dict[str, Dict[str, Any]] = {}
        self.commands: Dict[str, Callable] = {}
        self.main_fn: Optional[Callable] = None

    def named_config(self, name: str, updates: Dict[str, Any]) -> None:
        self.named_configs[name] = updates

    def command(self, name: str):
        def deco(fn):
            self.commands[name] = fn
            return fn

        return deco

    def main(self, fn: Callable) -> Callable:
        self.main_fn = fn
        return fn

    # -- config assembly ---------------------------------------------------
    def build_config(
        self,
        named: Sequence[str] = (),
        overrides: Optional[Mapping[str, Any]] = None,
    ) -> Dict[str, Any]:
        config = copy.deepcopy(self.default_config)
        for n in named:
            if n not in self.named_configs:
                raise KeyError(
                    f"unknown named config {n!r}; available: "
                    f"{sorted(self.named_configs)}"
                )
            deep_update(config, self.named_configs[n])
        for k, v in (overrides or {}).items():
            self._check_known_key(config, k)
            set_dotted(config, k, v)
        return config

    @staticmethod
    def _check_known_key(config: Dict[str, Any], dotted_key: str) -> None:
        """Rejects overrides of keys that exist nowhere in the config —
        Sacred's behavior for typo'd ``with a.b=c`` updates. Dicts whose
        name ends in ``kwargs`` (and empty dicts) are open: they accept
        arbitrary new keys, like Sacred config dicts populated by the
        callee."""
        parts = dotted_key.split(".")
        node = config
        for i, p in enumerate(parts):
            if not isinstance(node, dict):
                return  # descending into a non-dict errors later in set_dotted
            if p not in node:
                parent_name = parts[i - 1] if i else ""
                if parent_name.endswith("kwargs") or (node == {} and i):
                    return  # open dict: new keys allowed
                raise KeyError(
                    f"unknown config key {dotted_key!r} (no {p!r} at this "
                    f"level); available: {sorted(node)}"
                )
            node = node[p]

    def parse_cli(self, argv: Sequence[str]):
        """Parses ``[command] [with] [named|k=v ...]`` (Sacred grammar)."""
        argv = list(argv)
        command = None
        if argv and argv[0] in self.commands:
            command = argv.pop(0)
        if argv and argv[0] == "with":
            argv.pop(0)
        if argv and argv[0] == "print_config":
            argv.pop(0)
            config = self._parse_tokens(argv)
            print(json.dumps(config, indent=2, default=str))
            return None, None
        config = self._parse_tokens(argv)
        return command, config

    def _parse_tokens(self, tokens: Sequence[str]) -> Dict[str, Any]:
        named, overrides = [], {}
        for tok in tokens:
            if tok == "print_config":
                continue
            if "=" in tok:
                k, v = tok.split("=", 1)
                overrides[k] = parse_value(v)
            else:
                named.append(tok)
        return self.build_config(named, overrides)

    # -- run management ----------------------------------------------------
    def make_run_dir(self, config: Dict[str, Any]) -> str:
        log_root = config.get("log_root") or os.path.join("output", self.name)
        env_name = config.get("env_name", "unknown").replace("/", "_")
        run_dir = config.get("log_dir")
        if run_dir is None:
            run_dir = os.path.join(log_root, env_name, util.make_unique_timestamp())
        os.makedirs(run_dir, exist_ok=True)
        try:
            from imitation_tpu.util.run_dirs import link_latest

            # {log_root}/{env}/latest -> newest run dir
            link_latest(os.path.dirname(run_dir), run_dir)
        except Exception:
            pass
        with open(os.path.join(run_dir, "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)
        with open(os.path.join(run_dir, "run.json"), "w") as f:
            json.dump(
                {
                    "experiment": {"name": self.name},
                    "status": "RUNNING",
                    "start_time": datetime.datetime.now().isoformat(),
                },
                f,
                indent=2,
            )
        return run_dir

    def finish_run(self, run_dir: str, result: Any) -> None:
        run_path = os.path.join(run_dir, "run.json")
        with open(run_path) as f:
            run = json.load(f)
        run["status"] = "COMPLETED"
        run["stop_time"] = datetime.datetime.now().isoformat()
        run["result"] = result
        with open(run_path, "w") as f:
            json.dump(run, f, indent=2, default=str)

    def make_logger(self, run_dir: str, config: Dict[str, Any]) -> HierarchicalLogger:
        fmts = config.get("log_format_strs", ["stdout", "csv", "json"])
        return configure_logger(run_dir, fmts)

    def run_cli(self, argv: Optional[Sequence[str]] = None) -> Any:
        import imitation_tpu

        imitation_tpu.enable_compile_cache()
        argv = list(sys.argv[1:] if argv is None else argv)
        command, config = self.parse_cli(argv)
        if config is None:  # print_config
            return None
        run_dir = self.make_run_dir(config)
        logger = self.make_logger(run_dir, config)
        fn = self.commands[command] if command else self.main_fn
        if fn is None:
            raise ValueError(f"no command given and no main registered for {self.name}")
        try:
            result = fn(config, run_dir, logger)
        except BaseException as e:
            # Sacred records FAILED/INTERRUPTED with the error; analyze's
            # skip_failed_runs keys off this status (reference
            # scripts/analyze.py:40-41,73-77).
            self._mark_failed(run_dir, e)
            raise
        self.finish_run(run_dir, result)
        return result

    def _mark_failed(self, run_dir: str, error: BaseException) -> None:
        run_path = os.path.join(run_dir, "run.json")
        try:
            with open(run_path) as f:
                run = json.load(f)
        except Exception:
            run = {"experiment": {"name": self.name}}
        run["status"] = (
            "INTERRUPTED" if isinstance(error, KeyboardInterrupt) else "FAILED"
        )
        run["stop_time"] = datetime.datetime.now().isoformat()
        run["error"] = f"{type(error).__name__}: {error}"
        try:
            with open(run_path, "w") as f:
                json.dump(run, f, indent=2, default=str)
        except Exception:
            pass
