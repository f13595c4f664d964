"""Config-file-aware argument parsing (configargparse replacement).

The reference uses ``configargparse`` with ``--config`` as ``is_config_file``
(``run_nerf.py:37``); that package is not in this image, so this is a minimal
argparse subclass that reads the same ``key = value`` config-file format used
by the reference's ``configs/*.txt`` and lets CLI flags override file values.
"""
from __future__ import annotations

import argparse
import sys
from typing import Any, Dict, List, Sequence


def parse_config_file(path: str) -> Dict[str, str]:
    """Parse ``key = value`` lines; '#' starts a comment; blank lines skipped."""
    out: Dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            if "=" not in line:
                raise ValueError(f"bad config line: {line!r}")
            k, v = line.split("=", 1)
            out[k.strip()] = v.strip()
    return out


class ConfigArgumentParser(argparse.ArgumentParser):
    """argparse with configargparse-style ``--config`` support."""

    def _coerce(self, action: argparse.Action, raw: str) -> Any:
        if isinstance(action, (argparse._StoreTrueAction, argparse._StoreFalseAction)):
            return raw.lower() in ("true", "1", "yes")
        if action.nargs in ("+", "*") or isinstance(action.nargs, int):
            parts = raw.replace(",", " ").split()
            if raw.startswith("[") and raw.endswith("]"):
                parts = raw[1:-1].replace(",", " ").split()
            return [action.type(p) if action.type else p for p in parts]
        if action.type is not None:
            return action.type(raw)
        return raw

    def _apply_config(self, argv: Sequence[str]) -> None:
        if "--config" not in argv:
            return
        idx = list(argv).index("--config")
        if idx + 1 >= len(argv):
            return
        cfg = parse_config_file(argv[idx + 1])
        by_dest: Dict[str, argparse.Action] = {}
        by_opt: Dict[str, argparse.Action] = {}
        for action in self._actions:
            by_dest[action.dest] = action
            for opt in action.option_strings:
                by_opt[opt.lstrip("-")] = action
        defaults: Dict[str, Any] = {}
        for k, raw in cfg.items():
            action = by_dest.get(k) or by_opt.get(k)
            if action is None:
                print(f"[config] ignoring unknown key: {k}")
                continue
            defaults[action.dest] = self._coerce(action, raw)
            # configargparse parity: a value supplied by the config file
            # satisfies a required argument (e.g. datadir/dataset_type in the
            # shipped scene configs).
            action.required = False
        self.set_defaults(**defaults)

    def parse_known_args(self, args=None, namespace=None):
        argv = list(sys.argv[1:] if args is None else args)
        self._apply_config(argv)
        return super().parse_known_args(argv, namespace)


def compare_args(a: argparse.Namespace, b: argparse.Namespace,
                 keys: List[str]) -> bool:
    """True iff the listed hyper-parameters agree (reference ``utils/config.py:34-45``,
    the dormant arg-reload check at its ``run_nerf.py:282-291``)."""
    return all(getattr(a, k, None) == getattr(b, k, None) for k in keys)


def update_args(dst: argparse.Namespace, src: argparse.Namespace,
                keys: List[str]) -> argparse.Namespace:
    """Copy the listed hyper-parameters from src (reference ``utils/config.py:47-57``)."""
    for k in keys:
        setattr(dst, k, getattr(src, k))
    return dst


def write_args_file(args: argparse.Namespace, path: str) -> None:
    """Snapshot resolved args (reference dumps ``args.txt``, run_nerf.py:270-274)."""
    with open(path, "w") as f:
        for k in sorted(vars(args)):
            f.write(f"{k} = {getattr(args, k)}\n")
