"""YAML-config argument parsing — a self-contained configargparse equivalent
(the reference uses configargparse with `--configs` as an is_config_file arg,
/root/reference/main.py:31-33: YAML keys map 1:1 to flag names; CLI overrides
YAML; registries extend the parser across three parse_known_args stages)."""

from __future__ import annotations

import argparse
from typing import Optional

import yaml


class ConfigArgumentParser(argparse.ArgumentParser):
    """ArgumentParser whose `--configs <file.yml>` loads YAML keys as
    defaults. Matching rule: a YAML key `k` matches an option string `--k`
    or a dest `k` with '-' normalized to '_'. Values are coerced via the
    action's declared type; store_true flags accept booleans."""

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("allow_abbrev", False)
        super().__init__(*args, **kwargs)
        self.add_argument("--configs", required=False, default=None)
        self._loaded_config: Optional[dict] = None
        self._pending_config_keys: dict = {}

    def _find_action(self, key: str):
        norm = key.replace("-", "_")
        for action in self._actions:
            if action.dest == norm:
                return action
            for opt in action.option_strings:
                if opt.lstrip("-").replace("-", "_") == norm:
                    return action
        return None

    def _load_config(self, argv):
        if self._loaded_config is not None:
            return
        path = None
        for i, a in enumerate(argv):
            if a == "--configs" and i + 1 < len(argv):
                path = argv[i + 1]
            elif a.startswith("--configs="):
                path = a.split("=", 1)[1]
        if path is None:
            self._loaded_config = {}
            return
        with open(path) as f:
            self._loaded_config = yaml.safe_load(f) or {}
        self._pending_config_keys = dict(self._loaded_config)

    def _apply_config_defaults(self):
        """Re-applied on EVERY parse stage: config values must outrank any
        set_defaults() a registry applied after the config was loaded
        (configargparse semantics — dataset-util defaults only fill keys the
        YAML doesn't set)."""
        if self._loaded_config is None:
            return
        remaining = {}
        for key, value in self._loaded_config.items():
            action = self._find_action(key)
            if action is None:
                remaining[key] = value  # a later registry stage may add it
                continue
            if isinstance(action, argparse._StoreTrueAction) or isinstance(
                action, argparse._StoreFalseAction
            ):
                action.default = bool(value)
            elif action.type is not None and value is not None:
                if isinstance(value, list):
                    action.default = [action.type(v) for v in value]
                else:
                    action.default = action.type(value)
            else:
                action.default = value
        self._pending_config_keys = remaining

    def parse_known_args(self, args=None, namespace=None):
        import sys

        argv = list(sys.argv[1:]) if args is None else list(args)
        self._load_config(argv)
        self._apply_config_defaults()
        return super().parse_known_args(argv, namespace)

    def parse_args(self, args=None, namespace=None):
        ns, extras = self.parse_known_args(args, namespace)
        if self._pending_config_keys:
            unknown = ", ".join(self._pending_config_keys)
            raise SystemExit(f"unknown config keys: {unknown}")
        if extras:
            raise SystemExit(f"unrecognized arguments: {' '.join(extras)}")
        return ns
