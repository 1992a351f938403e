"""Configuration: one flat settings object covering the reference's
``~/.siril/siril.cfg`` knobs (src/core/initfile.c, 8 sections:
working-directory, libraw, debayer, prepro, registration, stacking,
photometry, misc), persisted as JSON.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass
from typing import Tuple


@dataclass
class Settings:
    # working directory (initfile.c working-directory section)
    working_directory: str = "."
    # debayer settings (siril.h:462-468)
    debayer_use_header: bool = True
    debayer_pattern: str = "RGGB"
    debayer_method: str = "bilinear"
    debayer_open: bool = False
    # prepro settings
    prepro_cfa: bool = False
    prepro_sigma: Tuple[float, float] = (3.0, 3.0)
    # registration settings
    registration_interpolation: int = 1  # bilinear
    # stacking settings (struct stack_config, siril.h:470-475)
    stack_method: str = "sum"
    stack_rejection: str = "winsorized"
    stack_normalization: str = "none"
    stack_sigma_low: float = 3.0
    stack_sigma_high: float = 3.0
    stack_memory_percent: float = 0.9
    # photometry settings (siril.h:456-460)
    phot_inner: float = 20.0
    phot_outer: float = 30.0
    phot_gain: float = 2.3
    # misc
    fits_extension: str = "fit"
    swap_dir: str = "/tmp"
    max_threads: int = 0  # 0 = all

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @classmethod
    def load(cls, path: str) -> "Settings":
        if not os.path.exists(path):
            return cls()
        with open(path) as f:
            raw = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in raw.items() if k in known}
        if "prepro_sigma" in kw:
            kw["prepro_sigma"] = tuple(kw["prepro_sigma"])
        return cls(**kw)


DEFAULT_CONFIG_PATH = os.path.expanduser("~/.siriltpu/config.json")


def load_default() -> Settings:
    return Settings.load(DEFAULT_CONFIG_PATH)


__all__ = ["Settings", "load_default", "DEFAULT_CONFIG_PATH"]
