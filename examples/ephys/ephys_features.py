"""Spike and sweep feature primitives for intracellular recordings.

Independent implementation of the standard intracellular feature set (spike
detection by dV/dt threshold, threshold refinement, peak/trough/upstroke/
downstroke, widths, ISI statistics, membrane time constant, pauses/bursts),
matching the definitions used by the reference's vendored extractors
(examples/ephys/ephys_features.py) and the Allen Cell Types whitepapers.

Units: v in mV, t in seconds, i in pA. dV/dt thresholds in V/s (= mV/ms).
"""

from __future__ import annotations

import warnings
from typing import Optional, Tuple

import numpy as np
from scipy.optimize import curve_fit


class FeatureError(ValueError):
    """Raised when a feature cannot be computed from the data."""


# ---------------------------------------------------------------------------
# Basics
# ---------------------------------------------------------------------------
def has_fixed_dt(t) -> bool:
    dt = np.diff(t)
    return bool(np.allclose(dt, dt[0], rtol=0, atol=dt[0] * 1e-4))


def find_time_index(t, t_0) -> int:
    """Index of the time point closest to t_0 (t must span t_0)."""
    if not (t[0] <= t_0 <= t[-1]):
        raise FeatureError(f't_0 ({t_0}) outside of time range '
                           f'({t[0]}, {t[-1]})')
    return int(np.argmin(np.abs(np.asarray(t) - t_0)))


def calculate_dvdt(v, t, filter: Optional[float] = None) -> np.ndarray:
    """dV/dt in V/s, optionally after a Bessel low-pass at `filter` kHz."""
    v = np.asarray(v, float)
    t = np.asarray(t, float)
    if filter is not None and has_fixed_dt(t):
        from scipy import signal
        dt = t[1] - t[0]
        nyq = 0.5 / dt  # Hz
        cutoff = filter * 1e3
        if cutoff < nyq:
            b, a = signal.bessel(4, cutoff / nyq, 'low')
            v = signal.filtfilt(b, a, v, axis=0)
        else:
            warnings.warn(
                'filter cutoff at/above Nyquist; skipping filtering')
    dv = np.diff(v)
    dt = np.diff(t)
    # mV / s -> V/s
    return dv / dt / 1000.0


def average_voltage(v, t, start=None, end=None) -> float:
    v = np.asarray(v, float)
    t = np.asarray(t, float)
    start_idx = find_time_index(t, start) if start is not None else 0
    end_idx = find_time_index(t, end) if end is not None else len(t) - 1
    return float(v[start_idx:end_idx].mean())


def get_isis(t, spikes) -> np.ndarray:
    """Interspike intervals from spike (threshold) indexes."""
    if len(spikes) <= 1:
        return np.array([])
    return np.diff(np.asarray(t)[np.asarray(spikes)])


def average_rate(t, spikes, start, end) -> float:
    """Spikes per second within [start, end]."""
    spike_times = np.asarray(t)[np.asarray(spikes, int)] if len(spikes) else \
        np.array([])
    n = np.sum((spike_times >= start) & (spike_times <= end))
    return float(n / (end - start))


def adaptation_index(isis) -> float:
    """Mean of successive normalized ISI differences."""
    isis = np.asarray(isis, float)
    if len(isis) < 2:
        return np.nan
    return float(np.mean((isis[1:] - isis[:-1]) / (isis[1:] + isis[:-1])))


def latency(t, spikes, start) -> float:
    """Time from stimulus start to first spike."""
    if len(spikes) == 0:
        raise FeatureError('cannot compute latency with no spikes')
    return float(np.asarray(t)[spikes[0]] - start)


def norm_diff(a) -> float:
    """Average of (a[i+1]-a[i]) / (a[i+1]+a[i])."""
    a = np.asarray(a, float)
    if len(a) < 2:
        return np.nan
    with np.errstate(invalid='ignore', divide='ignore'):
        nd = (a[1:] - a[:-1]) / (a[1:] + a[:-1])
    return float(np.nanmean(nd))


def norm_sq_diff(a) -> float:
    a = np.asarray(a, float)
    if len(a) < 2:
        return np.nan
    with np.errstate(invalid='ignore', divide='ignore'):
        nd = (a[1:] - a[:-1]) ** 2 / (a[1:] ** 2 + a[:-1] ** 2)
    return float(np.nanmean(nd))


# ---------------------------------------------------------------------------
# Spike detection
# ---------------------------------------------------------------------------
def detect_putative_spikes(v, t, start=None, end=None, filter=10.,
                           dv_cutoff=20.) -> np.ndarray:
    """Indexes where dV/dt crosses dv_cutoff (V/s) upward."""
    v = np.asarray(v, float)
    t = np.asarray(t, float)
    if start is None:
        start = t[0]
    if end is None:
        end = t[-1]
    start_idx = find_time_index(t, start)
    end_idx = find_time_index(t, end)
    v_w = v[start_idx:end_idx + 1]
    t_w = t[start_idx:end_idx + 1]
    dvdt = calculate_dvdt(v_w, t_w, filter)
    above = dvdt > dv_cutoff
    crossings = np.flatnonzero(above & ~np.concatenate([[False],
                                                        above[:-1]]))
    return crossings + start_idx


def find_peak_indexes(v, t, spike_indexes, end=None) -> np.ndarray:
    """Max-voltage index between each putative spike and the next."""
    v = np.asarray(v, float)
    t = np.asarray(t, float)
    if end is None:
        end = t[-1]
    end_idx = find_time_index(t, end)
    spike_indexes = np.asarray(spike_indexes, int)
    bounds = np.concatenate([spike_indexes[1:], [end_idx]])
    # Clamp degenerate windows (bound at/before the spike, e.g. `end` cut
    # inside the last spike) to the spike sample itself: dropping entries
    # would desynchronize the result from spike_indexes, and every caller
    # pairs the two arrays elementwise (filter_putative_spikes).
    peaks = [s + np.argmax(v[s:max(b, s) + 1])
             for s, b in zip(spike_indexes, bounds)]
    return np.asarray(peaks, int)


def filter_putative_spikes(v, t, spike_indexes, peak_indexes, min_height=2.,
                           min_peak=-30., filter=10., dvdt=None
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Drop detections whose peak is too low or rise too small."""
    v = np.asarray(v, float)
    t = np.asarray(t, float)
    spike_indexes = np.asarray(spike_indexes, int)
    peak_indexes = np.asarray(peak_indexes, int)
    if len(spike_indexes) == 0:
        return spike_indexes, peak_indexes

    keep = v[peak_indexes] >= min_peak
    spike_indexes = spike_indexes[keep]
    peak_indexes = peak_indexes[keep]
    if len(spike_indexes) == 0:
        return spike_indexes, peak_indexes

    # Merge detections that share a peak: keep the first threshold
    height = v[peak_indexes] - v[spike_indexes]
    keep = height >= min_height
    return spike_indexes[keep], peak_indexes[keep]


def find_upstroke_indexes(v, t, spike_indexes, peak_indexes, filter=10.,
                          dvdt=None) -> np.ndarray:
    """Index of maximum dV/dt between threshold and peak."""
    if dvdt is None:
        dvdt = calculate_dvdt(v, t, filter)
    ups = [s + np.argmax(dvdt[s:p]) if p > s else s
           for s, p in zip(np.asarray(spike_indexes, int),
                           np.asarray(peak_indexes, int))]
    return np.asarray(ups, int)


def refine_threshold_indexes(v, t, upstroke_indexes, thresh_frac=0.05,
                             filter=10., dvdt=None) -> np.ndarray:
    """Walk back from each upstroke to where dV/dt falls below
    thresh_frac * avg upstroke dV/dt."""
    if dvdt is None:
        dvdt = calculate_dvdt(v, t, filter)
    upstroke_indexes = np.asarray(upstroke_indexes, int)
    if len(upstroke_indexes) == 0:
        return upstroke_indexes
    avg_upstroke = dvdt[upstroke_indexes].mean()
    target = avg_upstroke * thresh_frac
    thresholds = []
    for u in upstroke_indexes:
        below = np.flatnonzero(dvdt[:u][::-1] < target)
        thresholds.append(u - below[0] if len(below) else 0)
    return np.asarray(thresholds, int)


def check_thresholds_and_peaks(v, t, spike_indexes, peak_indexes,
                               upstroke_indexes, end=None,
                               max_interval=0.005, thresh_frac=0.05,
                               filter=10., dvdt=None):
    """Drop spikes whose threshold-to-peak interval is too long and flag
    clipped spikes (peak at the window edge). Returns
    (spike_idx, peak_idx, upstroke_idx, clipped)."""
    v = np.asarray(v, float)
    t = np.asarray(t, float)
    spike_indexes = np.asarray(spike_indexes, int)
    peak_indexes = np.asarray(peak_indexes, int)
    upstroke_indexes = np.asarray(upstroke_indexes, int)
    if end is None:
        end = t[-1]
    end_idx = find_time_index(t, end)

    keep = (t[peak_indexes] - t[spike_indexes]) <= max_interval
    spike_indexes = spike_indexes[keep]
    peak_indexes = peak_indexes[keep]
    upstroke_indexes = upstroke_indexes[keep]

    clipped = np.zeros(len(spike_indexes), bool)
    if len(spike_indexes):
        clipped[-1] = peak_indexes[-1] >= end_idx - 1
    return spike_indexes, peak_indexes, upstroke_indexes, clipped


def find_trough_indexes(v, t, spike_indexes, peak_indexes, clipped=None,
                        end=None) -> np.ndarray:
    """Min-voltage index between each peak and the next threshold."""
    v = np.asarray(v, float)
    t = np.asarray(t, float)
    spike_indexes = np.asarray(spike_indexes, int)
    peak_indexes = np.asarray(peak_indexes, int)
    if len(spike_indexes) == 0:
        return np.array([])
    if end is None:
        end = t[-1]
    end_idx = find_time_index(t, end)
    if clipped is None:
        clipped = np.zeros(len(spike_indexes), bool)
    bounds = np.concatenate([spike_indexes[1:], [end_idx]])
    troughs = np.full(len(peak_indexes), np.nan)
    for k, (p, b) in enumerate(zip(peak_indexes, bounds)):
        if clipped[k] or b <= p:
            continue
        troughs[k] = p + np.argmin(v[p:b + 1])
    return troughs


def find_downstroke_indexes(v, t, peak_indexes, trough_indexes, clipped=None,
                            filter=10., dvdt=None) -> np.ndarray:
    """Index of minimum dV/dt between each peak and its trough."""
    if dvdt is None:
        dvdt = calculate_dvdt(v, t, filter)
    peak_indexes = np.asarray(peak_indexes, int)
    if clipped is None:
        clipped = np.zeros(len(peak_indexes), bool)
    downstrokes = np.full(len(peak_indexes), np.nan)
    for k, (p, tr) in enumerate(zip(peak_indexes, trough_indexes)):
        if clipped[k] or np.isnan(tr) or int(tr) <= p:
            continue
        downstrokes[k] = p + np.argmin(dvdt[p:int(tr)])
    return downstrokes


def find_widths(v, t, spike_indexes, peak_indexes, trough_indexes,
                clipped=None) -> np.ndarray:
    """Spike width at half height (threshold-to-peak), in seconds."""
    v = np.asarray(v, float)
    t = np.asarray(t, float)
    spike_indexes = np.asarray(spike_indexes, int)
    peak_indexes = np.asarray(peak_indexes, int)
    if clipped is None:
        clipped = np.zeros(len(spike_indexes), bool)
    widths = np.full(len(spike_indexes), np.nan)
    for k, (s, p, tr) in enumerate(
            zip(spike_indexes, peak_indexes, trough_indexes)):
        if clipped[k] or np.isnan(tr):
            continue
        tr = int(tr)
        half = v[s] + 0.5 * (v[p] - v[s])
        above_rise = np.flatnonzero(v[s:p + 1] >= half)
        above_fall = np.flatnonzero(v[p:tr + 1] <= half)
        if len(above_rise) == 0 or len(above_fall) == 0:
            continue
        rise_idx = s + above_rise[0]
        fall_idx = p + above_fall[0]
        widths[k] = t[fall_idx] - t[rise_idx]
    return widths


def analyze_trough_details(v, t, spike_indexes, peak_indexes, clipped=None,
                           end=None, filter=10., heavy_dvdt_frac=0.01,
                           term_frac=0.01, adp_thresh=0.5, tol=0.5,
                           flat_interval=0.002, adp_max_delta_t=0.005,
                           adp_max_delta_v=10., dvdt=None):
    """Fast trough / ADP / slow trough decomposition.

    Simplified: the fast trough is where dV/dt first flattens after the
    downstroke; anything depolarizing afterwards before the next spike is an
    ADP; the slow trough is the overall minimum afterwards. Returns
    (isi_types, fast_trough_idx, adp_idx, slow_trough_idx) arrays.
    """
    v = np.asarray(v, float)
    t = np.asarray(t, float)
    spike_indexes = np.asarray(spike_indexes, int)
    peak_indexes = np.asarray(peak_indexes, int)
    if dvdt is None:
        dvdt = calculate_dvdt(v, t, filter)
    if end is None:
        end = t[-1]
    end_idx = find_time_index(t, end)
    if clipped is None:
        clipped = np.zeros(len(spike_indexes), bool)

    n = len(spike_indexes)
    isi_types = np.full(n, None, dtype=object)
    fast = np.full(n, np.nan)
    adp = np.full(n, np.nan)
    slow = np.full(n, np.nan)
    bounds = np.concatenate([spike_indexes[1:], [end_idx]])
    for k in range(n):
        if clipped[k] or bounds[k] <= peak_indexes[k]:
            continue
        p, b = peak_indexes[k], bounds[k]
        seg_min = p + np.argmin(v[p:b + 1])
        # fast trough: first point after peak where |dV/dt| is small
        flat = np.flatnonzero(
            np.abs(dvdt[p:min(b, len(dvdt))]) <
            heavy_dvdt_frac * max(abs(dvdt[p:min(b, len(dvdt))]).max(), 1e-9))
        fast_idx = p + flat[0] if len(flat) else seg_min
        fast[k] = fast_idx
        # ADP: local max between fast trough and overall min
        if seg_min > fast_idx + 1:
            seg = v[fast_idx:seg_min + 1]
            rel_max = int(np.argmax(seg))
            if (seg[rel_max] - v[fast_idx] > adp_thresh
                    and t[fast_idx + rel_max] - t[fast_idx]
                    < adp_max_delta_t):
                adp[k] = fast_idx + rel_max
        slow[k] = seg_min
        isi_types[k] = 'detour' if abs(v[seg_min] - v[fast_idx]) > tol \
            else 'direct'
    return isi_types, fast, adp, slow


# ---------------------------------------------------------------------------
# Subthreshold fits
# ---------------------------------------------------------------------------
def _exp_curve(x, a, inv_tau, y0):
    return y0 + a * np.exp(-inv_tau * x)


def fit_membrane_time_constant(v, t, start, end, min_rsme=1e-4
                               ) -> Tuple[float, float, float]:
    """Fit v = y0 + a*exp(-t/tau) on [start, end]; returns (a, 1/tau, y0),
    tau in seconds."""
    v = np.asarray(v, float)
    t = np.asarray(t, float)
    start_idx = find_time_index(t, start)
    end_idx = find_time_index(t, end)
    if end_idx <= start_idx + 3:
        raise FeatureError('not enough points for time-constant fit')
    tw = t[start_idx:end_idx] - t[start_idx]
    vw = v[start_idx:end_idx]
    guess = (vw[0] - vw[-1], 50.0, vw[-1])
    try:
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            popt, _ = curve_fit(_exp_curve, tw, vw, p0=guess, maxfev=10000)
    except RuntimeError as e:
        raise FeatureError('membrane time-constant fit failed') from e
    pred = _exp_curve(tw, *popt)
    rsme = np.sqrt(np.mean((vw - pred) ** 2))
    if rsme > max(min_rsme, 0.1 * np.abs(vw[0] - vw[-1])):
        warnings.warn('poor membrane time-constant fit quality')
    return tuple(float(p) for p in popt)


# ---------------------------------------------------------------------------
# Spike-train structure
# ---------------------------------------------------------------------------
def detect_pauses(isis, isi_types, cost_weight=1.0) -> np.ndarray:
    """Indexes of unusually long 'direct' ISIs (simple robust z-score)."""
    isis = np.asarray(isis, float)
    if len(isis) < 3:
        return np.array([], int)
    med = np.median(isis)
    mad = np.median(np.abs(isis - med)) + 1e-12
    z = (isis - med) / (1.4826 * mad)
    pause_idx = np.flatnonzero(z > 3.0 * cost_weight)
    if isi_types is not None:
        # Pauses are defined on 'direct' ISIs only (AllenSDK semantics):
        # a long detour ISI is the after-hyperpolarization of a burst, not
        # a pause in regular firing.
        pause_idx = np.array(
            [i for i in pause_idx if isi_types[i] == 'direct'], int)
    return pause_idx


def detect_bursts(isis, isi_types, fast_tr_v, fast_tr_t, slow_tr_v,
                  slow_tr_t, thr_v, tol=0.5, pause_cost=1.0) -> list:
    """Greedy burst segmentation: runs of short ISIs (< half the median)
    bounded by long ISIs. Returns a list of (rate_ratio, start, end) per
    burst, empty when firing is regular."""
    isis = np.asarray(isis, float)
    if len(isis) < 3:
        return []
    # Burst threshold: well below the long-ISI mode. Using only the median
    # fails when most ISIs are inside bursts, so anchor on the max too.
    thresh = max(0.5 * float(np.median(isis)), 0.1 * float(np.max(isis)))
    in_burst = isis < thresh
    if in_burst.all() or not in_burst.any():
        return []
    baseline = isis[~in_burst].mean()
    bursts = []
    k = 0
    while k < len(isis):
        if in_burst[k]:
            start = k
            while k < len(isis) and in_burst[k]:
                k += 1
            end = k
            if end - start >= 2:
                burst_rate = 1.0 / isis[start:end].mean()
                bursts.append((float(burst_rate * baseline), start, end))
        else:
            k += 1
    return bursts


def refine_threshold_indexes_based_on_third_derivative(
        v, t, peak_indexes, upstroke_indexes, filter=10., dvdt=None):
    """Threshold refinement via the third voltage derivative (reference
    ephys_features.py:189-220): for each spike, walk backwards from its
    upstroke toward the previous inter-spike minimum and take the point of
    maximal d3V/dt3 — the sharpest onset of the depolarization. More robust
    than the dV/dt-fraction rule when the pre-spike rise is very steep."""
    upstroke_indexes = np.asarray(upstroke_indexes, int)
    if upstroke_indexes.size == 0:
        return np.array([], int)
    if dvdt is None:
        dvdt = calculate_dvdt(v, t, filter)
    d2 = calculate_dvdt(dvdt, t[:-1], filter)
    d3 = calculate_dvdt(d2, t[:-2], filter)
    v = np.asarray(v, float)
    peak_indexes = np.asarray(peak_indexes, int)

    prev_peaks = np.concatenate([[0], peak_indexes[:-1]])
    out = []
    for prev_pk, upstk in zip(prev_peaks, upstroke_indexes):
        # lower search bound: the voltage minimum between the previous peak
        # and this upstroke (same interval the reference scans, expressed
        # forward instead of via a negative-stride slice)
        lo = prev_pk + int(np.argmin(v[prev_pk:upstk])) if upstk > prev_pk \
            else prev_pk
        seg = d3[lo + 1:upstk + 1]   # the reference scans upstk..lo+1
        if seg.size == 0:
            out.append(upstk)
            continue
        # backwards argmax == last forward argmax at equal values; the
        # reference scans upstroke->lo with stride -1, so ties resolve to
        # the index nearest the upstroke
        rev_off = int(np.argmax(seg[::-1]))
        out.append(upstk - rev_off)
    return np.array(out, int)


def refine_threshold_indexes_updated(v, t, upstroke_indexes, start=None,
                                     thresh_frac=0.05, filter=10.,
                                     dvdt=None):
    """Threshold refinement bounded at the stimulus start (reference
    ephys_features.py:222-268): like `refine_threshold_indexes` but the
    first spike's backward search stops at `start`, and a depolarization
    already steeper than target AT the start (a "too steep" onset) falls
    back to the dV/dt minimum on the interval instead of the fraction
    rule."""
    upstroke_indexes = np.asarray(upstroke_indexes, int)
    if upstroke_indexes.size == 0:
        return np.array([], int)
    t = np.asarray(t, float)
    if start is None:
        start = t[0]
    start_index = find_time_index(t, start)
    if dvdt is None:
        dvdt = calculate_dvdt(v, t, filter)

    target = float(np.mean(dvdt[upstroke_indexes])) * thresh_frac
    bounds = np.concatenate([[start_index], upstroke_indexes[:-1]])
    out = []
    for lo, upstk in zip(bounds, upstroke_indexes):
        seg_rev = dvdt[upstk:lo:-1] if upstk > lo else np.array([])
        if lo == start_index and lo != find_time_index(t, 0.1):
            # too-steep depolarization right at the window start: take the
            # dV/dt minimum on the interval (reference:258-260)
            if seg_rev.size:
                out.append(upstk - int(np.argmin(seg_rev)))
            else:
                out.append(upstk)
            continue
        below = np.flatnonzero(seg_rev <= target)
        out.append(lo if below.size == 0 else upstk - int(below[0]))
    return np.array(out, int)


def check_threshold_w_peak(v, t, spike_indexes, peak_indexes, clipped):
    """Drop noise 'spikes' whose peak follows the putative threshold by
    less than 0.2 ms (reference ephys_features.py:415-428): a real action
    potential cannot rise that fast; such pairs are filter artifacts."""
    spike_indexes = np.asarray(spike_indexes, int)
    peak_indexes = np.asarray(peak_indexes, int)
    if spike_indexes.size == 0 or peak_indexes.size == 0:
        return np.array([], int), np.array([], int), np.array([], bool)
    t = np.asarray(t, float)
    keep = (t[peak_indexes] - t[spike_indexes]) > 0.0002
    return (spike_indexes[keep], peak_indexes[keep],
            np.asarray(clipped, bool)[keep])


def check_trough_w_peak(spike_indexes, upstroke_indexes, peak_indexes,
                        trough_indexes, clipped, filter=10., dvdt=None):
    """Drop 'spikes' whose peak and trough landed on the same sample
    (reference ephys_features.py:476-492): stimulus-offset bumps produce
    degenerate detections where the voltage never actually falls."""
    spike_indexes = np.asarray(spike_indexes)
    peak_indexes = np.asarray(peak_indexes)
    if spike_indexes.size == 0 or peak_indexes.size == 0:
        return (np.array([], int), np.array([], int), np.array([], int),
                np.array([], float), np.array([], bool))
    trough_indexes = np.asarray(trough_indexes, float)
    keep = peak_indexes.astype(float) != trough_indexes
    return (spike_indexes[keep], np.asarray(upstroke_indexes)[keep],
            peak_indexes[keep], trough_indexes[keep],
            np.asarray(clipped, bool)[keep])


def find_widths_wrt_threshold(v, t, spike_indexes, peak_indexes,
                              trough_indexes, clipped=None):
    """Spike width at half-height where height is peak-minus-THRESHOLD
    (reference ephys_features.py:601-652; `find_widths` uses peak-minus-
    trough height instead). The falling crossing is searched between peak
    and trough; NaN when either crossing is missing or the spike is
    clipped."""
    v = np.asarray(v, float)
    t = np.asarray(t, float)
    spike_indexes = np.asarray(spike_indexes, int)
    peak_indexes = np.asarray(peak_indexes, int)
    if spike_indexes.size == 0 or peak_indexes.size == 0:
        return np.array([])
    if len(spike_indexes) < len(trough_indexes):
        raise FeatureError('Cannot have more troughs than spikes')
    trough_indexes = np.asarray(trough_indexes, float)
    if clipped is None:
        clipped = np.zeros(len(spike_indexes), bool)

    widths = np.full(len(spike_indexes), np.nan)
    for k, (s, p) in enumerate(zip(spike_indexes, peak_indexes)):
        if k >= len(trough_indexes) or np.isnan(trough_indexes[k]) \
                or clipped[k]:
            continue
        tr = int(trough_indexes[k])
        level = v[s] + 0.5 * (v[p] - v[s])
        rise_rev = np.flatnonzero(v[p:s:-1] <= level)
        fall = np.flatnonzero(v[p:tr] <= level)
        if rise_rev.size == 0 or fall.size == 0:
            continue
        widths[k] = t[p + fall[0]] - t[p - rise_rev[0]]
    return widths


def _exp_curve_at_end(x, b, inv_tau, A):
    return A + b * (1 - np.exp(-inv_tau * x))


def fit_membrane_time_constant_at_end(v, t, start, end, min_rsme=1e-4):
    """Fit v = A + b*(1 - exp(-t/tau)) on [start, end] — the RELAXATION
    back toward baseline after a hyperpolarizing step ends (reference
    ephys_features.py:988-1025). Returns (b, 1/tau, A); NaNs if the fit
    fails. Deviation: the reference's RSME rejection computes
    sqrt(mean(signed residual)) which is NaN for any fit that overshoots
    (NaN > min_rsme is False), making the check a no-op — we use the true
    RMSE against max(min_rsme, 10% of the fitted swing) and only warn."""
    v = np.asarray(v, float)
    t = np.asarray(t, float)
    start_index = find_time_index(t, start)
    end_index = find_time_index(t, end)
    if end_index <= start_index + 3:
        return np.nan, np.nan, np.nan
    tw = (t[start_index:end_index] - t[start_index]).astype(np.float64)
    vw = v[start_index:end_index].astype(np.float64)
    guess = (vw[-1] - vw[0], 50.0, vw[0])
    try:
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            popt, _ = curve_fit(_exp_curve_at_end, tw, vw, p0=guess,
                                maxfev=10000)
    except RuntimeError:
        return np.nan, np.nan, np.nan
    pred = _exp_curve_at_end(tw, *popt)
    rsme = np.sqrt(np.mean((vw - pred) ** 2))
    if rsme > max(min_rsme, 0.1 * abs(vw[-1] - vw[0])):
        warnings.warn('poor end-of-step time-constant fit quality')
    return tuple(float(p) for p in popt)


def _dbl_exp_fit(y0, x, A1, tau1, A2, tau2):
    penalty = 1e6 if (tau1 < 0 or tau2 < 0) else 0.0
    return y0 + A1 * np.exp(-x / tau1) + A2 * np.exp(-x / tau2) + penalty


def fit_prespike_time_constant(v, t, start, spike_time, dv_limit=-0.001,
                               tau_limit=0.3):
    """Dominant time constant of the pre-spike voltage rise (reference
    ephys_features.py:1209-1282): log-linearize for a single-exponential
    seed, refit as a double exponential, then pick the dominant tau by the
    reference's empirical weight/ratio rules. Used by delay_metrics."""
    from functools import partial

    v = np.asarray(v, float)
    t = np.asarray(t, float)
    start_index = find_time_index(t, start)
    end_index = find_time_index(t, spike_time)
    if end_index <= start_index:
        raise FeatureError(
            'Start for pre-spike time constant fit cannot be after the '
            'spike time.')

    vs = v[start_index:end_index]
    ts = t[start_index:end_index]

    # single-exponential seed via the log-linear trick
    y0 = vs.max() + 5e-6
    y = np.log(y0 - vs)
    dy = calculate_dvdt(y, ts, filter=1.0)

    # truncate the window where the voltage starts dropping
    drops = np.flatnonzero(dy <= dv_limit)
    cross_limit = 0.0005  # sec
    if drops.size and ts[drops[0]] - ts[0] >= cross_limit:
        cut = drops[0]
    else:
        cut = len(vs)
    K, A_log = np.polyfit(ts[:cut] - ts[0], y[:cut], 1)
    A = np.exp(A_log)

    try:
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            popt, _ = curve_fit(partial(_dbl_exp_fit, y0), ts - ts[0], vs,
                                p0=(-A / 2.0, -1.0 / K, -A / 2.0, -1.0 / K),
                                maxfev=10000)
    except RuntimeError:
        return -1.0 / K   # fall back to the single-exponential seed

    if popt[1] < popt[3]:
        faster_w, faster_tau, slower_w, slower_tau = popt
    else:
        slower_w, slower_tau, faster_w, faster_tau = popt

    # empirical dominance rules (reference:1270-1280)
    if abs(faster_w) > abs(slower_w):
        return float(faster_tau)
    if (slower_tau - faster_tau) / slower_tau <= 0.1:
        return float(slower_tau)
    if slower_tau > tau_limit and slower_w / faster_w < 2.0:
        return float(faster_tau)
    return float(slower_tau)


def _burstiness_index(in_burst_isis, out_burst_isis):
    """Normalized peak-rate contrast between in-burst and out-of-burst
    firing (reference ephys_features.py:1371-1374)."""
    burst_rate = 1.0 / np.min(in_burst_isis)
    out_rate = 1.0 / np.min(out_burst_isis)
    return (burst_rate - out_rate) / (burst_rate + out_rate)


def _score_burst_set(bursts, isis, delta_t, c_n=0.1, c_tx=0.01):
    """Score a candidate burst segmentation (reference
    ephys_features.py:1347-1368): burstiness minus costs for starting,
    ending, and extending each burst. All-in-burst sets score -1e12."""
    isis = np.asarray(isis, float)
    in_burst = np.zeros(len(isis), bool)
    for b in bursts:
        in_burst[b[0]:b[1]] = True
    if not (~in_burst).any():
        return [-1e12] * len(bursts)
    delta_frac = np.asarray(delta_t, float) / isis
    scores = []
    for b in bursts:
        s = _burstiness_index(isis[b[0]:b[1]], isis[~in_burst])
        if b[1] < len(delta_t):
            s -= c_tx / delta_frac[b[1]]
        if b[0] > 0:
            s -= c_tx / delta_frac[b[0] - 1]
        s -= c_n * (b[1] - b[0] - 1)
        scores.append(s)
    return scores


def estimate_adjusted_detection_parameters(v_set, t_set, interval_start,
                                           interval_end, filter=10.):
    """Estimate dv_cutoff and thresh_frac from noise in a quiet interval."""
    cutoffs = []
    for v, t in zip(v_set, t_set):
        dvdt = calculate_dvdt(v, t, filter)
        s = find_time_index(t, interval_start)
        e = find_time_index(t, interval_end)
        noise = np.std(dvdt[s:e])
        cutoffs.append(max(20.0, 10.0 * noise))
    dv_cutoff = float(np.mean(cutoffs))
    thresh_frac = min(0.05 * dv_cutoff / 20.0, 0.2)
    return dv_cutoff, float(thresh_frac)
