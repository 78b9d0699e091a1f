"""Minimal yacs-compatible config system.

The reference uses yacs `CfgNode` with a custom multi-file inheritance scheme
(`merge_cfg`, reference: multi_part_assembly/utils/config_utils.py:6-19 and
docs/config.md:52-79): a leaf config declares ``_base_ = {field: path}`` and
each parent config module is imported and grafted as a sub-node, with child
keys winning.  yacs is not available here, so this module provides a small
re-implementation of the subset we need, with the same Python-file config
authoring style.
"""

import copy
import importlib.util
import os
import sys

__all__ = ['CfgNode', 'CN', 'merge_cfg', 'load_cfg_file', 'cfg_to_dict']


class CfgNode(dict):
    """An attribute-access dict with freeze support (yacs-compatible subset)."""

    IMMUTABLE = '__immutable__'

    def __init__(self, init_dict=None):
        super().__init__()
        object.__setattr__(self, CfgNode.IMMUTABLE, False)
        if init_dict:
            for k, v in init_dict.items():
                self[k] = self._to_cfg(v)

    @classmethod
    def _to_cfg(cls, value):
        if isinstance(value, dict) and not isinstance(value, CfgNode):
            return cls(value)
        return value

    # --- attribute access ---
    def __getattr__(self, name):
        if name in self:
            return self[name]
        raise AttributeError(
            f'CfgNode has no attribute {name!r}; keys: {sorted(self.keys())}')

    def __setattr__(self, name, value):
        if object.__getattribute__(self, CfgNode.IMMUTABLE):
            raise AttributeError(
                f'Attempted to set {name} on an immutable CfgNode')
        self[name] = self._to_cfg(value)

    def __setitem__(self, name, value):
        if object.__getattribute__(self, CfgNode.IMMUTABLE):
            raise AttributeError(
                f'Attempted to set {name} on an immutable CfgNode')
        super().__setitem__(name, self._to_cfg(value))

    # --- yacs API subset ---
    def clone(self):
        return copy.deepcopy(self)

    def freeze(self):
        object.__setattr__(self, CfgNode.IMMUTABLE, True)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()

    def defrost(self):
        object.__setattr__(self, CfgNode.IMMUTABLE, False)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()

    def is_frozen(self):
        return object.__getattribute__(self, CfgNode.IMMUTABLE)

    def merge_from_other_cfg(self, other):
        """Recursively merge `other` into self (other's values win)."""
        for k, v in other.items():
            if k in self and isinstance(self[k], CfgNode) and \
                    isinstance(v, (dict, CfgNode)):
                self[k].merge_from_other_cfg(v)
            else:
                self[k] = self._to_cfg(copy.deepcopy(v))
        return self

    def merge_from_list(self, cfg_list):
        """Merge from a flat list like ['a.b.c', value, ...] (CLI overrides)."""
        assert len(cfg_list) % 2 == 0, 'override list must be key/value pairs'
        for key, value in zip(cfg_list[0::2], cfg_list[1::2]):
            node = self
            parts = key.split('.')
            for p in parts[:-1]:
                node = node[p]
            old = node.get(parts[-1], None)
            if isinstance(value, str) and old is not None and \
                    not isinstance(old, str):
                value = _decode_value(value, type(old))
            node[parts[-1]] = value
        return self

    def get(self, key, default=None):
        return super().get(key, default)

    def __deepcopy__(self, memo):
        new = CfgNode()
        memo[id(self)] = new
        for k, v in self.items():
            dict.__setitem__(new, k, copy.deepcopy(v, memo))
        return new

    def __copy__(self):
        return self.clone()

    def __reduce__(self):
        return (CfgNode, (cfg_to_dict(self), ))

    def dump(self, indent=0):
        """Pretty-print as an indented string."""
        lines = []
        for k in sorted(self.keys()):
            v = self[k]
            pad = ' ' * indent
            if isinstance(v, CfgNode):
                lines.append(f'{pad}{k}:')
                lines.append(v.dump(indent + 2))
            else:
                lines.append(f'{pad}{k}: {v!r}')
        return '\n'.join(lines)

    def __str__(self):
        return self.dump()


CN = CfgNode


def _decode_value(value, target_type):
    """Cast a CLI string override to the type of the existing config value."""
    if target_type is bool:
        return value.lower() in ('1', 'true', 'yes')
    if target_type in (list, tuple):
        return target_type(
            v for v in value.strip('[]()').split(',') if v != '')
    return target_type(value)


def cfg_to_dict(cfg):
    """Recursively convert a CfgNode to a plain dict (for serialization)."""
    out = {}
    for k, v in cfg.items():
        out[k] = cfg_to_dict(v) if isinstance(v, CfgNode) else v
    return out


def _import_file(path):
    """Import a python file as an anonymous module."""
    path = os.path.abspath(path)
    name = '_cfg_' + os.path.splitext(os.path.basename(path))[0] + \
        f'_{abs(hash(path)) % (1 << 30):x}'
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def merge_cfg(base_cfg, base_dir, cfg_lst):
    """Merge a dict of {field: parent-config-path} into `base_cfg`.

    Mirrors reference config_utils.py:6-19: each parent file is imported, its
    `get_cfg_defaults()` grafted under `field`; keys already present in the
    child config win.
    """
    for k, v in cfg_lst.items():
        lib = _import_file(os.path.join(base_dir, v))
        sub_cfg = lib.get_cfg_defaults()
        if k not in base_cfg:
            base_cfg[k] = sub_cfg
        else:
            for key, value in sub_cfg.items():
                if key not in base_cfg[k]:
                    base_cfg[k][key] = value
    return base_cfg


def load_cfg_file(cfg_file):
    """Import a leaf config file and return its composed CfgNode."""
    mod = _import_file(cfg_file)
    cfg = mod.get_cfg_defaults()
    cfg.cfg_file = os.path.abspath(cfg_file)
    return cfg
