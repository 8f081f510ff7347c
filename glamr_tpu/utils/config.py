"""Unified YAML config system.

The reference ships four near-identical loaders
({motion_infiller,traj_pred,global_recon}/utils/config*.py); this is the
single replacement. A config is selected by id: the loader globs
`<root>/cfg/**/<id>.yml` (plus the packaged glamr_tpu/cfg), exposes the
YAML mapping with attribute access and `.get(key, default)`, and keeps the
raw dict at `.yml_dict`. The YAML schemas (grecon_model_specs,
opt_stage_specs{opt_lr,opt_niters,opt_variables,loss_cfg}, model_specs,
loss_specs, ...) are byte-compatible with the reference's cfg files.
"""
from __future__ import annotations

import glob
import os
from typing import Any, Optional

import yaml

PACKAGED_CFG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "cfg")


def find_cfg_file(cfg_id: str, cfg_root: Optional[str] = None) -> str:
    """Resolve a config id to a file path (reference config.py:16-18)."""
    if os.path.isfile(cfg_id):
        return cfg_id
    roots = []
    if cfg_root:
        roots.append(cfg_root)
    roots += [os.path.join(os.getcwd(), "cfg"), PACKAGED_CFG_DIR]
    for root in roots:
        hits = sorted(glob.glob(os.path.join(root, "**", f"{cfg_id}.yml"), recursive=True))
        if hits:
            return hits[0]
    raise FileNotFoundError(f"config '{cfg_id}' not found under {roots}")


class Config:
    """Attribute-style view over a YAML mapping."""

    def __init__(self, cfg_id: str, cfg_root: Optional[str] = None,
                 out_dir: Optional[str] = None, create_dirs: bool = False,
                 overrides: Optional[dict] = None):
        self.cfg_file = find_cfg_file(cfg_id, cfg_root)
        self.id = os.path.splitext(os.path.basename(self.cfg_file))[0]
        with open(self.cfg_file) as f:
            self.yml_dict = yaml.safe_load(f) or {}
        if overrides:
            self.yml_dict.update(overrides)

        self.out_dir = out_dir or os.path.join("out", "glamr_tpu", self.id)
        if create_dirs:
            os.makedirs(self.out_dir, exist_ok=True)
            # keep a copy of the config next to the results, like the
            # reference's grecon config loader (global_recon/utils/config.py:48-52)
            with open(os.path.join(self.out_dir, f"{self.id}.yml"), "w") as f:
                yaml.safe_dump(self.yml_dict, f)

    def __getattr__(self, name: str) -> Any:
        yml = self.__dict__.get("yml_dict")
        if yml is not None and name in yml:
            return yml[name]
        raise AttributeError(f"config '{self.id}' has no key '{name}'")

    def get(self, name: str, default: Any = None) -> Any:
        return self.yml_dict.get(name, default)

    def __contains__(self, name: str) -> bool:
        return name in self.yml_dict

    def __repr__(self) -> str:
        return f"Config({self.id!r}, file={self.cfg_file!r})"
