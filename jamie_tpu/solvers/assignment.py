"""Hard pair extraction from the soft correspondence F.

Reference parity: `linear_sum_assignment(max(F) - F)` in fit_transform
(jamie/jamie.py:175-182). Hungarian assignment is an inherently sequential
O(N^3) combinatorial algorithm — it stays on host scipy (same C internals the
reference uses); the expensive part (building F) is on device.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment


def hungarian_pairs(F: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    cost = np.max(F) - F
    row_ind, col_ind = linear_sum_assignment(cost)
    return row_ind, col_ind
