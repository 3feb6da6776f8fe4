"""Config system: YAML + attribute-dict + CLI overrides.

Reproduces the reference's config surface (reference utils/io_util.py:194-340)
without the addict dependency:
- `ConfigDict`: attribute access, KeyError on missing (ForceKeyErrorDict,
  io_util.py:194-196);
- `load_config(args, unknown)`: `--key value` and `--sec:key value`
  type-coerced overrides (io_util.py:234-257), `--resume_dir` reload of a
  saved config.yaml (io_util.py:287-300);
- `save_config` snapshot (io_util.py:226-231).

The reference's YAML configs (configs/*.yaml) load unchanged.
"""
import argparse
import ast
import copy
import os
from typing import Any, Dict, List, Optional

import yaml


class ConfigDict(dict):
    """dict with attribute access; raises KeyError on missing keys."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        for a in args:
            for k, v in dict(a).items():
                self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    def __setitem__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, ConfigDict):
            v = ConfigDict(v)
        super().__setitem__(k, v)

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise KeyError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def __deepcopy__(self, memo):
        return ConfigDict({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def get(self, k, default=None):
        return super().get(k, default)

    def setdefault(self, k, default=None):
        if k not in self:
            self[k] = default
        return self[k]

    def to_dict(self) -> Dict[str, Any]:
        return {k: (v.to_dict() if isinstance(v, ConfigDict) else v)
                for k, v in self.items()}


def load_yaml(path: str, default_path: Optional[str] = None) -> ConfigDict:
    with open(path, encoding="utf8") as f:
        config = ConfigDict(yaml.load(f, Loader=yaml.FullLoader))
    if default_path is not None and path != default_path:
        with open(default_path, encoding="utf8") as f:
            main = ConfigDict(yaml.load(f, Loader=yaml.FullLoader))
        main.update(config)
        config = main
    return config


def save_config(config: ConfigDict, path: str):
    config = copy.deepcopy(config)
    if "training" in config:
        config.training["ckpt_file"] = None
        config.training.pop("exp_dir", None)
    with open(path, "w", encoding="utf8") as f:
        yaml.dump(config.to_dict(), f, default_flow_style=False)


def update_config(config: ConfigDict, unknown: List[str]) -> ConfigDict:
    """Apply `--key value` / `--sec:key value` CLI overrides (io_util.py:234-257)."""
    for idx, arg in enumerate(unknown):
        if not arg.startswith("--"):
            continue
        raw = unknown[idx + 1]
        if ":" in arg:
            k1, k2 = arg.replace("--", "").split(":")
            if k2 in config[k1]:
                cur = config[k1][k2]
                if isinstance(cur, bool):
                    v = raw.lower() == "true"
                elif cur is not None:
                    v = type(cur)(raw)
                else:
                    v = raw
            else:
                # extension over the reference (io_util.py:245 raises
                # KeyError): allow introducing NEW keys from the CLI, with
                # literal-eval coercion (e.g. `--model:rays_chunk 512`)
                try:
                    v = ast.literal_eval(raw)
                except (ValueError, SyntaxError):
                    v = raw
                print(f"Adding new config key {k1}:{k2}")
            print(f"Changing {k1}:{k2} ---- {config[k1].get(k2)} to {v}")
            config[k1][k2] = v
        else:
            k = arg.replace("--", "")
            print(f"Changing {k} ---- {config.get(k)} to {raw}")
            config[k] = raw
    return config


def create_args_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None,
                        help="Path to config file.")
    parser.add_argument("--resume_dir", type=str, default=None,
                        help="Directory of experiment to load.")
    return parser


def load_config(args, unknown: List[str],
                base_config_path: Optional[str] = None) -> ConfigDict:
    """command line --over--> args.config --over--> default yaml
    (io_util.py:268-340)."""
    assert (args.config is not None) != (args.resume_dir is not None), \
        "you must specify ONLY one in 'config' or 'resume_dir'"
    unknown = [u for u in unknown if "local_rank" not in u]
    print("=> Parse extra configs: ", unknown)
    if args.resume_dir is not None:
        assert "--expname" not in unknown, \
            "--expname with --resume_dir leads to unexpected behavior."
        config = load_yaml(os.path.join(args.resume_dir, "config.yaml"),
                           default_path=None)
        config = update_config(config, unknown)
        config.training["exp_dir"] = args.resume_dir
        print("=> Loading previous experiments in: {}".format(
            config.training["exp_dir"]))
    else:
        config = load_yaml(args.config, default_path=base_config_path)
        config = update_config(config, unknown)
        if "exp_dir" not in config.training:
            config.training["exp_dir"] = os.path.join(
                config.training["log_root_dir"], config["expname"])

    other = vars(args).copy()
    other.pop("config", None)
    other.pop("resume_dir", None)
    config.update(other)
    # device_ids semantics (io_util.py:321-338): on TPU, -1 means "all
    # local devices"; retained for config compatibility.
    return config


def cond_mkdir(path: str):
    os.makedirs(path, exist_ok=True)
