"""YAML configuration system.

Behavior-compatible with the reference config layer
(`/root/reference/btcdet/config.py`): an attribute-accessible nested dict
tree loaded from YAML, `_BASE_CONFIG_` file inheritance, and dotted-path
CLI overrides (`KEY.SUBKEY value`) with literal-eval type coercion, so the
reference's shipped YAML files load unchanged.
"""

from __future__ import annotations

import ast
import copy
from pathlib import Path

import yaml


class EasyDict(dict):
    """dict with attribute access, recursively applied to nested dicts."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        d = dict(d or {}, **kwargs)
        for k, v in d.items():
            self[k] = v

    @staticmethod
    def _wrap(v):
        if isinstance(v, dict) and not isinstance(v, EasyDict):
            return EasyDict(v)
        if isinstance(v, (list, tuple)):
            return type(v)(EasyDict._wrap(x) for x in v)
        return v

    def __setitem__(self, k, v):
        super().__setitem__(k, EasyDict._wrap(v))

    def __setattr__(self, k, v):
        self[k] = v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __delattr__(self, k):
        del self[k]

    def get(self, k, default=None):
        return super().get(k, default)

    def __deepcopy__(self, memo):
        return EasyDict({k: copy.deepcopy(v, memo) for k, v in self.items()})


def merge_new_config(config: EasyDict, new_config: dict, base_dir: Path | None = None) -> EasyDict:
    """Recursively merge `new_config` into `config`.

    `_BASE_CONFIG_` entries are resolved first (relative to `base_dir`,
    falling back to CWD), matching the reference's include semantics
    (reference `btcdet/config.py:51-68`).
    """
    if "_BASE_CONFIG_" in new_config:
        base_rel = new_config["_BASE_CONFIG_"]
        candidates = []
        if base_dir is not None:
            candidates.append(Path(base_dir) / base_rel)
            # reference resolves relative to tools/ CWD; also try repo-style
            candidates.append(Path(base_dir).parent / base_rel)
            candidates.append(Path(base_dir).parent.parent / base_rel)
        candidates.append(Path(base_rel))
        for cand in candidates:
            if cand.exists():
                with open(cand) as f:
                    base_cfg = yaml.safe_load(f)
                merge_new_config(config, base_cfg, base_dir=cand.parent)
                break
        else:
            raise FileNotFoundError(f"_BASE_CONFIG_ {base_rel} not found (tried {candidates})")

    for key, val in new_config.items():
        if key == "_BASE_CONFIG_":
            continue
        if isinstance(val, dict):
            if key not in config or not isinstance(config.get(key), dict):
                config[key] = EasyDict()
            merge_new_config(config[key], val, base_dir=base_dir)
        else:
            config[key] = val
    return config


def cfg_from_yaml_file(cfg_file, config: EasyDict | None = None) -> EasyDict:
    config = config if config is not None else EasyDict()
    cfg_file = Path(cfg_file)
    with open(cfg_file) as f:
        new_config = yaml.safe_load(f)
    merge_new_config(config, new_config, base_dir=cfg_file.parent)
    return config


def cfg_from_list(cfg_list, config: EasyDict) -> EasyDict:
    """Set config keys via dotted-path list, e.g.
    ['MODEL.OCC.PARAMS.OCC_THRESH', '0.4'] (reference `config.py:16-48`)."""
    assert len(cfg_list) % 2 == 0, "override list must be key/value pairs"
    for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
        keys = full_key.split(".")
        d = config
        for subkey in keys[:-1]:
            if subkey not in d:
                d[subkey] = EasyDict()
            d = d[subkey]
        subkey = keys[-1]
        try:
            value = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            value = v
        if subkey in d and d[subkey] is not None:
            old = d[subkey]
            if isinstance(old, dict) and isinstance(value, str):
                # merge "k1:v1,k2:v2" style strings into dicts
                kv = {}
                for pair in value.split(","):
                    k2, v2 = pair.split(":")
                    try:
                        kv[k2.strip()] = ast.literal_eval(v2.strip())
                    except (ValueError, SyntaxError):
                        kv[k2.strip()] = v2.strip()
                old.update(kv)
                continue
            if not isinstance(value, type(old)) and old is not None and not isinstance(old, bool):
                # allow int->float style coercion, reject others loudly
                if isinstance(old, float) and isinstance(value, int):
                    value = float(value)
                elif isinstance(old, list) and isinstance(value, (list, tuple)):
                    value = list(value)
        d[subkey] = value
    return config


def log_config_to_file(cfg: EasyDict, pre="cfg", logger=None):
    for key, val in cfg.items():
        if isinstance(val, EasyDict):
            if logger:
                logger.info(f"\n{pre}.{key} = edict()")
            log_config_to_file(val, pre=f"{pre}.{key}", logger=logger)
            continue
        if logger:
            logger.info(f"{pre}.{key}: {val}")


class CfgBox:
    """Opaque wrapper so config trees can be stored as flax module fields
    without being converted to FrozenDict (which drops attribute access).
    Forwards attribute/item/get to the wrapped EasyDict."""

    def __init__(self, cfg):
        object.__setattr__(self, "_cfg", cfg)

    @property
    def raw(self):
        return self._cfg

    def __getattr__(self, k):
        try:
            return self._cfg[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __getitem__(self, k):
        return self._cfg[k]

    def __contains__(self, k):
        return k in self._cfg

    def get(self, k, default=None):
        return self._cfg.get(k, default)

    def __repr__(self):
        return f"CfgBox({self._cfg!r})"

    def __eq__(self, other):
        return isinstance(other, CfgBox) and self._cfg == other._cfg

    def __hash__(self):
        return hash(repr(sorted(self._cfg.keys())))


# module-level global config, same idiom as the reference (`config.py:84-86`)
cfg = EasyDict()
cfg.ROOT_DIR = str(Path(__file__).resolve().parent.parent)
cfg.LOCAL_RANK = 0
