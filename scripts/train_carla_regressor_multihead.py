"""Multihead CARLA ego-coordinate regressor — one regression head per town
(reference scripts/train_carla_regressor_multihead.py). Shares the
implementation of train_carla_regressor.py with n_heads > 1."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from train_carla_regressor import main

if __name__ == "__main__":
    main(multihead=True)
