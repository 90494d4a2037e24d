"""Append-file logger + seeding (toolbox/utils.py:60-70, 115-123)."""

from __future__ import annotations

import os
import random

import numpy as np


class Logger:
    def __init__(self, save_dir: str | None, also_print: bool = True):
        self.path = None
        self.also_print = also_print
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            self.path = os.path.join(save_dir, "log")

    def write(self, text: str):
        if self.path:
            with open(self.path, "a") as f:
                f.write(text)
        if self.also_print:
            print(text, end="" if text.endswith("\n") else "\n")


def setup_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)
