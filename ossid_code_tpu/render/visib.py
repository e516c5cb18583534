"""Visible-mask estimation, matching bop_toolkit's bop19 semantics.

The online loop turns a rendered depth of the predicted pose into a
pseudo-label mask for DTOID finetuning via
`bop_toolkit_lib.visibility.estimate_visib_mask_gt(depth, pred_depth, 15mm)`
(ref scripts/online_learning.py:500). This reimplements that contract: a
rendered pixel is visible iff both depths are positive and the rendered
surface is not behind the observed surface by more than `delta`.
"""

from __future__ import annotations

import numpy as np


def estimate_visib_mask(d_test: np.ndarray, d_model: np.ndarray, delta: float) -> np.ndarray:
    valid = (d_test > 0) & (d_model > 0)
    return valid & ((d_model - d_test) <= delta)


def estimate_visib_mask_gt(d_test: np.ndarray, d_gt: np.ndarray, delta: float) -> np.ndarray:
    return estimate_visib_mask(d_test, d_gt, delta)
