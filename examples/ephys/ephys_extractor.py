"""Sweep / sweep-set / cell feature extractors.

Independent implementation with the reference's extractor API shape
(examples/ephys/ephys_extractor.py: EphysSweepFeatureExtractor:54,
EphysSweepSetFeatureExtractor:696, EphysCellFeatureExtractor:809): a sweep
extractor detects and characterizes spikes and sweep-level features from one
(t, v, i) trace; a sweep-set groups sweeps; the cell extractor aggregates
long-square responses into cell-level features (rheobase, f-I slope, vrest,
sag, tau, adaptation, latency, ISI stats) — the e-feature modality used by
the scMNC pipelines.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from . import ephys_features as ft


class EphysSweepFeatureExtractor:
    def __init__(self, t=None, v=None, i=None, start=None, end=None,
                 filter=10., dv_cutoff=20., max_interval=0.005,
                 min_height=2., min_peak=-30., thresh_frac=0.05,
                 baseline_interval=0.1, baseline_detect_thresh=0.3,
                 id=None):
        self.t = np.asarray(t, float) if t is not None else None
        self.v = np.asarray(v, float) if v is not None else None
        self.i = np.asarray(i, float) if i is not None else None
        self.start = start
        self.end = end
        self.filter = filter
        self.dv_cutoff = dv_cutoff
        self.max_interval = max_interval
        self.min_height = min_height
        self.min_peak = min_peak
        self.thresh_frac = thresh_frac
        self.baseline_interval = baseline_interval
        self.baseline_detect_thresh = baseline_detect_thresh
        self.id = id
        self._spikes_df: Optional[Dict[str, np.ndarray]] = None
        self._sweep_features: Dict[str, float] = {}
        self.stimulus_amplitude_calculator = None
        # Spike features whose value for a window-clipped spike is
        # undefined (reference :157-259): everything measured after the
        # peak, plus features derived from those.
        self._affected_by_clipping = [
            'isi_type', 'width', 'upstroke_downstroke_ratio']
        for base in ('trough', 'downstroke', 'fast_trough', 'adp',
                     'slow_trough'):
            self._affected_by_clipping += [
                base + '_index', base + '_t', base + '_v', base + '_i',
                base]

    # -------------------------------------------------------------- spikes
    def process_spikes(self):
        """Detect and characterize every spike in the sweep."""
        v, t = self.v, self.t
        start = self.start if self.start is not None else t[0]
        end = self.end if self.end is not None else t[-1]

        dvdt = ft.calculate_dvdt(v, t, self.filter)
        putative = ft.detect_putative_spikes(
            v, t, start, end, self.filter, self.dv_cutoff)
        if len(putative) == 0:
            self._spikes_df = {k: np.array([]) for k in (
                'threshold_index', 'peak_index', 'trough_index',
                'upstroke_index', 'downstroke_index')}
            self._postprocess_spikes(dvdt)
            return
        peaks = ft.find_peak_indexes(v, t, putative, end)
        putative, peaks = ft.filter_putative_spikes(
            v, t, putative, peaks, self.min_height, self.min_peak,
            self.filter, dvdt)
        if len(putative) == 0:
            self._spikes_df = {k: np.array([]) for k in (
                'threshold_index', 'peak_index', 'trough_index',
                'upstroke_index', 'downstroke_index')}
            self._postprocess_spikes(dvdt)
            return
        upstrokes = ft.find_upstroke_indexes(v, t, putative, peaks,
                                             self.filter, dvdt)
        thresholds = ft.refine_threshold_indexes(
            v, t, upstrokes, self.thresh_frac, self.filter, dvdt)
        thresholds, peaks, upstrokes, clipped = ft.check_thresholds_and_peaks(
            v, t, thresholds, peaks, upstrokes, end, self.max_interval,
            self.thresh_frac, self.filter, dvdt)
        troughs = ft.find_trough_indexes(v, t, thresholds, peaks, clipped,
                                         end)
        downstrokes = ft.find_downstroke_indexes(
            v, t, peaks, troughs, clipped, self.filter, dvdt)
        widths = ft.find_widths(v, t, thresholds, peaks, troughs, clipped)
        isi_types, fast_tr, adp, slow_tr = ft.analyze_trough_details(
            v, t, thresholds, peaks, clipped, end, self.filter, dvdt=dvdt)

        df = {
            'threshold_index': thresholds,
            'peak_index': peaks,
            'upstroke_index': upstrokes,
            'trough_index': troughs,
            'downstroke_index': downstrokes,
            'clipped': clipped,
            'width': widths,
            'isi_type': isi_types,
            'fast_trough_index': fast_tr,
            'adp_index': adp,
            'slow_trough_index': slow_tr,
        }
        self._spikes_df = df
        self._postprocess_spikes(dvdt)

    def _postprocess_spikes(self, dvdt=None):
        df = self._spikes_df
        v, t = self.v, self.t
        if dvdt is None:   # callers pass the one computed in process_spikes
            dvdt = ft.calculate_dvdt(v, t, self.filter)

        def vt_at(idx_key, prefix):
            idx = df.get(idx_key, np.array([]))
            vv = np.full(len(idx), np.nan)
            tt = np.full(len(idx), np.nan)
            for k, x in enumerate(np.atleast_1d(idx)):
                if x is None or (isinstance(x, float) and np.isnan(x)):
                    continue
                vv[k] = v[int(x)]
                tt[k] = t[int(x)]
            df[prefix + '_v'] = vv
            df[prefix + '_t'] = tt

        for key, prefix in (('threshold_index', 'threshold'),
                            ('peak_index', 'peak'),
                            ('trough_index', 'trough'),
                            ('fast_trough_index', 'fast_trough'),
                            ('adp_index', 'adp'),
                            ('slow_trough_index', 'slow_trough')):
            vt_at(key, prefix)
        ups = df.get('upstroke_index', np.array([]))
        downs = df.get('downstroke_index', np.array([]))
        df['upstroke'] = np.array(
            [dvdt[int(u)] if not np.isnan(u) else np.nan
             for u in np.atleast_1d(ups).astype(float)]) \
            if len(np.atleast_1d(ups)) else np.array([])
        df['downstroke'] = np.array(
            [dvdt[int(d)] if not (d is None or np.isnan(d)) else np.nan
             for d in np.atleast_1d(downs).astype(float)]) \
            if len(np.atleast_1d(downs)) else np.array([])
        with np.errstate(invalid='ignore', divide='ignore'):
            if len(df['upstroke']) and len(df['downstroke']):
                df['upstroke_downstroke_ratio'] = (
                    df['upstroke'] / -df['downstroke'])
            else:
                df['upstroke_downstroke_ratio'] = np.array([])

    def spike_feature(self, key: str, include_clipped=False,
                      force_exclude_clipped=False) -> np.ndarray:
        assert self._spikes_df is not None, 'spikes not processed yet'
        if key not in self._spikes_df:
            if len(self._spikes_df.get('threshold_index', [])) == 0:
                return np.array([])
            raise KeyError(f'feature {key} not available')
        if include_clipped and force_exclude_clipped:
            raise ValueError('include_clipped and force_exclude_clipped '
                             'cannot both be true')
        vals = np.asarray(self._spikes_df[key])
        drop_clipped = force_exclude_clipped or (
            not include_clipped
            and self.is_spike_feature_affected_by_clipping(key))
        if drop_clipped and 'clipped' in self._spikes_df \
                and len(vals) == len(self._spikes_df['clipped']):
            # reference :595-608: clipped (window-truncated) spikes are
            # excluded only for features their truncation invalidates
            return vals[~np.asarray(self._spikes_df['clipped'], bool)]
        return vals

    def is_spike_feature_affected_by_clipping(self, key: str) -> bool:
        return key in self._affected_by_clipping

    def spikes(self) -> List[Dict]:
        """All features of each spike as a list of records
        (reference :573-575)."""
        assert self._spikes_df is not None, 'spikes not processed yet'
        keys = list(self._spikes_df.keys())
        n = len(self._spikes_df.get('threshold_index', []))
        return [{k: np.asarray(self._spikes_df[k])[j]
                 for k in keys if len(np.atleast_1d(self._spikes_df[k])) == n}
                for j in range(n)]

    def spike_feature_keys(self) -> List[str]:
        return list(self._spikes_df.keys()) if self._spikes_df else []

    # ------------------------------------------------------ sweep features
    def process_new_spike_feature(self, name, func):
        self._spikes_df[name] = func(self)

    def process_spikes_and_features(self):
        self.process_spikes()
        self._process_sweep_features()

    def _process_sweep_features(self):
        t = self.t
        start = self.start if self.start is not None else t[0]
        end = self.end if self.end is not None else t[-1]
        thr_idx = self._spikes_df['threshold_index'].astype(int) \
            if len(self._spikes_df['threshold_index']) else np.array([], int)
        isis = ft.get_isis(t, thr_idx)
        feats = {
            'avg_rate': ft.average_rate(t, thr_idx, start, end),
            'adapt': ft.adaptation_index(isis) if len(isis) > 1 else np.nan,
            'latency': (ft.latency(t, thr_idx, start)
                        if len(thr_idx) else np.nan),
            'isi_cv': (float(np.std(isis) / np.mean(isis))
                       if len(isis) > 1 else np.nan),
            'mean_isi': float(np.mean(isis)) if len(isis) else np.nan,
            'median_isi': float(np.median(isis)) if len(isis) else np.nan,
            'first_isi': float(isis[0]) if len(isis) else np.nan,
        }
        self._sweep_features.update(feats)

    def sweep_feature(self, key: str, allow_missing=False):
        if key in self._sweep_features:
            return self._sweep_features[key]
        computers = {
            'v_baseline': self._get_baseline_voltage,
            'tau': self._get_tau,
            'sag': self._get_sag,
            'peak_deflect': self._get_peak_deflection,
            'stim_amp': self._get_stim_amp,
        }
        if key in computers:
            val = computers[key]()
            self._sweep_features[key] = val
            return val
        if allow_missing:
            return None
        raise KeyError(f'sweep feature {key} not available')

    def sweep_feature_keys(self) -> List[str]:
        return list(self._sweep_features.keys())

    def process_new_sweep_feature(self, name, func):
        self._sweep_features[name] = func(self)

    # ------------------------------------------- spike-train structure
    def _isis_and_types(self):
        thr = np.asarray(self._spikes_df['threshold_index'], float)
        thr = thr[~np.isnan(thr)].astype(int)
        isis = ft.get_isis(self.t, thr)
        types = np.asarray(self._spikes_df['isi_type'],
                           object)[:len(isis)] if len(isis) else \
            np.array([], object)
        return thr, isis, types

    def _process_pauses(self, cost_weight=1.0):
        """Indexes of pause ISIs (reference :291-297)."""
        _, isis, isi_types = self._isis_and_types()
        return ft.detect_pauses(isis, isi_types, cost_weight)

    def pause_metrics(self):
        """(n_pauses, pause_frac): pause count and the fraction of the
        stimulus interval spent paused (reference :299-327)."""
        _, isis, _ = self._isis_and_types()
        pauses = self._process_pauses()
        if len(pauses) == 0:
            return 0, 0.0
        start = self.start if self.start is not None else self.t[0]
        end = self.end if self.end is not None else self.t[-1]
        return len(pauses), float(isis[pauses].sum() / (end - start))

    def _process_bursts(self, tol=0.5, pause_cost=1.0):
        """Burst segmentation rows (score, start, end)
        (reference :329-344)."""
        df = self._spikes_df
        _, isis, isi_types = self._isis_and_types()
        bursts = ft.detect_bursts(
            isis, isi_types,
            np.asarray(df['fast_trough_v'], float),
            np.asarray(df['fast_trough_t'], float),
            np.asarray(df['slow_trough_v'], float),
            np.asarray(df['slow_trough_t'], float),
            np.asarray(df['threshold_v'], float), tol, pause_cost)
        return np.array(bursts)

    def burst_metrics(self):
        """(max_burstiness_index, num_bursts) (reference :346-360)."""
        info = self._process_bursts()
        if info.shape[0] > 0:
            return float(info[:, 0].max()), int(info.shape[0])
        return 0.0, 0

    def delay_metrics(self):
        """(delay_ratio, tau): first-spike latency over the pre-spike rise
        time constant (reference :362-382)."""
        thr_t = np.asarray(self._spikes_df.get('threshold_t', []), float)
        thr_t = thr_t[~np.isnan(thr_t)]
        if len(thr_t) == 0:
            return 0.0, 0.0
        spike_time = float(thr_t[0])
        start = self.start if self.start is not None else self.t[0]
        tau = ft.fit_prespike_time_constant(self.v, self.t, start,
                                            spike_time)
        return (spike_time - start) / tau, tau

    # ---------------------------------------- reference sweep-level API
    def set_stimulus_amplitude_calculator(self, function):
        self.stimulus_amplitude_calculator = function

    def stimulus_amplitude(self) -> float:
        return (self.stimulus_amplitude_calculator(self)
                if self.stimulus_amplitude_calculator is not None
                else np.nan)

    def voltage_deflection(self, deflect_type=None):
        """(deflect_v, deflect_index): extreme voltage between start and
        end; direction from `deflect_type` ('min'/'max') or the current
        sign at the window midpoint (reference :406-453)."""
        start = self.start if self.start else 0
        end = self.end if self.end else self.t[-1]
        s = ft.find_time_index(self.t, start)
        e = ft.find_time_index(self.t, end)
        if deflect_type is None:
            if self.i is not None:
                mid = ft.find_time_index(self.t, (end - start) / 2. + start)
                deflect_type = 'max' if self.i[mid] >= 0 else 'min'
            else:
                deflect_type = 'min'
        pick = np.argmax if deflect_type == 'max' else np.argmin
        idx = int(pick(self.v[s:e])) + s
        return float(self.v[idx]), idx

    def estimate_time_constant(self) -> float:
        """Membrane tau (s) from a single-exponential fit of the onset
        transient of a hyperpolarizing step (reference :462-501). The fit
        starts where the deflection reaches 10% of its extreme and ends at
        the deflection peak; traces with a noise peak below -200 mV refit
        against an earlier local minimum (reference's workaround kept)."""
        v_peak, peak_index = self.voltage_deflection('min')
        v_baseline = self.sweep_feature('v_baseline')
        start_index = ft.find_time_index(self.t, self.start) \
            if self.start else 0
        frac = 0.1
        search = np.flatnonzero(
            self.v[start_index:] <= frac * (v_peak - v_baseline)
            + v_baseline)
        if not search.size:
            raise ft.FeatureError(
                'could not find interval for time constant estimate')
        fit_start = self.t[search[0] + start_index]
        fit_end = self.t[peak_index]
        if self.v[peak_index] < -200:
            # noisy downward artifact: refit between just after onset and
            # a local minimum well before the artifact
            end_index = (start_index + 50) + int(np.argmin(
                self.v[start_index + 50:peak_index - 1250]))
            fit_end = self.t[end_index]
            fit_start = self.t[start_index + 50]
        a, inv_tau, y0 = ft.fit_membrane_time_constant(
            self.v, self.t, fit_start, fit_end)
        return 1.0 / inv_tau

    def estimate_time_constant_at_end(self) -> float:
        """Membrane tau (s) from the relaxation AFTER a hyperpolarizing
        step ends (reference :503-528)."""
        v_peak, _ = self.voltage_deflection('min')
        v_baseline = self.sweep_feature('v_baseline')
        start_index = ft.find_time_index(self.t, self.end) if self.end \
            else ft.find_time_index(self.t, 0.7)
        frac = 0.1
        search = np.flatnonzero(
            self.v[start_index:] >= frac * (v_baseline - v_peak) + v_peak)
        if not search.size:
            raise ft.FeatureError(
                'Could not find interval for time constant estimate')
        b, inv_tau, A = ft.fit_membrane_time_constant_at_end(
            self.v, self.t, self.t[search[0] + start_index], self.t[-1])
        return 1.0 / inv_tau

    def estimate_sag(self, peak_width=0.005):
        """(sag, sag_ratio) of a hyperpolarizing response
        (reference :530-570): sag = how far the membrane relaxes back from
        the peak deflection toward baseline by steady state; sag_ratio =
        peak deflection over steady-state deflection."""
        t, v = self.t, self.v
        start = self.start if self.start else 0
        end = self.end if self.end else t[-1]
        v_peak, peak_index = self.voltage_deflection('min')
        if v[peak_index] < -200:
            # same noisy-artifact workaround as estimate_time_constant
            peak_index -= (ft.find_time_index(t, 0.12)
                           - ft.find_time_index(t, 0.1))
        v_peak_avg = ft.average_voltage(
            v, t, start=t[peak_index] - peak_width / 2.,
            end=t[peak_index] + peak_width / 2.)
        v_baseline = self.sweep_feature('v_baseline')
        v_steady = ft.average_voltage(
            v, t, start=end - self.baseline_interval, end=end)
        sag = (v_peak_avg - v_steady) / (v_peak_avg - v_baseline)
        sag_ratio = (v_peak_avg - v_baseline) / (v_steady - v_baseline)
        return float(sag), float(sag_ratio)

    # ------------------------------------------------- subthreshold pieces
    def _get_baseline_voltage(self) -> float:
        start = self.start if self.start is not None else self.t[0]
        b0 = max(self.t[0], start - self.baseline_interval)
        if b0 >= start:
            return float(self.v[0])
        return ft.average_voltage(self.v, self.t, b0, start)

    def _get_stim_amp(self) -> float:
        if self.i is None:
            return np.nan
        start = self.start if self.start is not None else self.t[0]
        end = self.end if self.end is not None else self.t[-1]
        s = ft.find_time_index(self.t, start)
        e = ft.find_time_index(self.t, end)
        during = float(np.median(self.i[s:e]))
        before = float(np.median(self.i[:s])) if s > 0 else 0.0
        return during - before

    def _get_peak_deflection(self):
        start = self.start if self.start is not None else self.t[0]
        end = self.end if self.end is not None else self.t[-1]
        s = ft.find_time_index(self.t, start)
        e = ft.find_time_index(self.t, end)
        baseline = self._get_baseline_voltage()
        seg = self.v[s:e]
        amp = self._get_stim_amp()
        idx = int(np.argmin(seg)) if (np.isnan(amp) or amp <= 0) \
            else int(np.argmax(seg))
        return float(seg[idx]), s + idx

    def _get_tau(self) -> float:
        """Membrane time constant from the stimulus-onset transient (s)."""
        start = self.start if self.start is not None else self.t[0]
        peak_v, peak_idx = self._get_peak_deflection()
        try:
            # fit from 10% into the transient to the deflection peak
            t_peak = self.t[peak_idx]
            fit_start = start + 0.1 * (t_peak - start)
            a, inv_tau, y0 = ft.fit_membrane_time_constant(
                self.v, self.t, fit_start, t_peak)
            return float(1.0 / inv_tau)
        except (ft.FeatureError, ZeroDivisionError):
            return np.nan

    def _get_sag(self) -> float:
        """Sag ratio: (peak deflection - steady state) / peak deflection,
        relative to baseline, for hyperpolarizing steps."""
        start = self.start if self.start is not None else self.t[0]
        end = self.end if self.end is not None else self.t[-1]
        baseline = self._get_baseline_voltage()
        peak_v, _ = self._get_peak_deflection()
        steady = ft.average_voltage(self.v, self.t, end - 0.1 * (end - start),
                                    end)
        defl = peak_v - baseline
        if abs(defl) < 1e-9:
            return np.nan
        return float((peak_v - steady) / defl)

    # ------------------------------------------------------------- helpers
    def spike_count(self) -> int:
        return int(len(self._spikes_df['threshold_index'])) \
            if self._spikes_df else 0

    def as_dict(self) -> Dict:
        return {'spikes': self._spikes_df, 'sweep': self._sweep_features}


class EphysSweepSetFeatureExtractor:
    def __init__(self, t_set=None, v_set=None, i_set=None, start=None,
                 end=None, id_set=None, **kwargs):
        t_set = t_set or []
        v_set = v_set or []
        i_set = i_set if i_set is not None else [None] * len(t_set)
        id_set = id_set if id_set is not None else list(range(len(t_set)))
        starts = start if isinstance(start, (list, tuple, np.ndarray)) \
            else [start] * len(t_set)
        ends = end if isinstance(end, (list, tuple, np.ndarray)) \
            else [end] * len(t_set)
        self._sweeps = [
            EphysSweepFeatureExtractor(t, v, i, s, e, id=sid, **kwargs)
            for t, v, i, s, e, sid
            in zip(t_set, v_set, i_set, starts, ends, id_set)]

    @classmethod
    def from_sweeps(cls, sweep_list):
        obj = cls()
        obj._sweeps = list(sweep_list)
        return obj

    def sweeps(self) -> List[EphysSweepFeatureExtractor]:
        return self._sweeps

    def process_spikes(self):
        for s in self._sweeps:
            s.process_spikes_and_features()

    def sweep_features(self, key, allow_missing=False) -> np.ndarray:
        return np.array([s.sweep_feature(key, allow_missing)
                         for s in self._sweeps])

    def spike_feature_averages(self, key) -> np.ndarray:
        out = []
        for s in self._sweeps:
            vals = s.spike_feature(key)
            vals = vals[~np.isnan(np.asarray(vals, float))] \
                if len(vals) else vals
            out.append(np.mean(vals) if len(vals) else np.nan)
        return np.array(out)


def step_stim_amp(sweep) -> float:
    """Stimulus amplitude of a long step: current just after onset
    (reference examples/ephys/ephys_extractor.py:1171-1173)."""
    k = ft.find_time_index(sweep.t, sweep.start)
    return float(sweep.i[k + 1])


def short_step_stim_amp(sweep) -> float:
    """Stimulus amplitude of a brief pulse: max current after onset
    (reference examples/ephys/ephys_extractor.py:1176-1178)."""
    k = ft.find_time_index(sweep.t, sweep.start)
    return float(np.max(sweep.i[k + 1:]))


# Standard Allen-protocol stimulus windows (seconds; reference :46-50).
RAMPS_START = 1.02
LONG_SQUARES_START = 1.02
LONG_SQUARES_END = 2.02
SHORT_SQUARES_WINDOW_START = 1.02
SHORT_SQUARES_WINDOW_END = 1.021


def reset_long_squares_start(when):
    """Shift the module's long-square window to start at `when`, keeping
    its duration (reference :1090-1094) — for recordings whose stimulus
    onset differs from the Allen default."""
    global LONG_SQUARES_START, LONG_SQUARES_END
    delta = LONG_SQUARES_END - LONG_SQUARES_START
    LONG_SQUARES_START = when
    LONG_SQUARES_END = when + delta


def input_resistance(ext) -> float:
    """Input resistance in MOhm from the slope of peak deflection voltage
    vs injected current across hyperpolarizing sweeps (reference
    :1034-1064); a single sweep is anchored with its own baseline at
    i=0."""
    sweeps = ext.sweeps()
    if not sweeps:
        raise ft.FeatureError(
            'no sweeps available for input resistance calculation')
    v_vals, i_vals = [], []
    for sweep in sweeps:
        if sweep.i is None:
            raise ft.FeatureError('cannot calculate input resistance: '
                                  'i not defined for a sweep')
        v_peak, min_index = sweep.voltage_deflection('min')
        v_vals.append(v_peak)
        i_vals.append(sweep.i[min_index])
    v = np.array(v_vals, float)
    i = np.array(i_vals, float)
    if len(v) == 1:
        v = np.append(v, sweeps[0].sweep_feature('v_baseline'))
        i = np.append(i, 0.)
    A = np.vstack([i, np.ones_like(i)]).T
    m, c = np.linalg.lstsq(A, v, rcond=None)[0]
    return float(m * 1e3)   # mV/pA -> MOhm


def membrane_time_constant(ext) -> float:
    """Mean membrane time constant over a sweep set (reference
    :1067-1073)."""
    import warnings as _warnings
    with _warnings.catch_warnings():
        _warnings.simplefilter('ignore', RuntimeWarning)
        return float(np.nanmean(ext.sweep_features('tau')))


def fit_fi_slope(ext) -> float:
    """Slope of the firing rate vs stimulus amplitude line over
    suprathreshold long squares (reference :1076-1087)."""
    if len(ext.sweeps()) < 2:
        raise ft.FeatureError('Cannot fit f-I curve slope with less than '
                              'two suprathreshold sweeps')
    x = np.array([step_stim_amp(s) for s in ext.sweeps()], float)
    y = np.asarray(ext.sweep_features('avg_rate'), float)
    A = np.vstack([x, np.ones_like(x)]).T
    m, c = np.linalg.lstsq(A, y, rcond=None)[0]
    return float(m)


def extractor_for_nwb_sweeps(dataset, sweep_numbers, fixed_start=None,
                             fixed_end=None, dv_cutoff=20.,
                             thresh_frac=0.05):
    """Sweep-set extractor over NWB sweeps (reference :1135-1168).
    `dataset` needs a get_sweep(n) returning {'response' (V), 'stimulus'
    (A), 'sampling_rate' (Hz), 'index_range'} — the AllenSDK NwbDataSet
    contract; any object honoring it works (tests use a synthetic one)."""
    t_set, v_set, i_set, start, end = [], [], [], [], []
    for sweep_number in sweep_numbers:
        data = dataset.get_sweep(sweep_number)
        v = np.asarray(data['response'], float) * 1e3    # V -> mV
        i = np.asarray(data['stimulus'], float) * 1e12   # A -> pA
        dt = 1.0 / data['sampling_rate']
        t = np.arange(len(v)) * dt
        s, e = dt * np.array(data['index_range'], float)
        t_set.append(t)
        v_set.append(v)
        i_set.append(i)
        start.append(s)
        end.append(e)
    if fixed_start and not fixed_end:
        start = [fixed_start] * len(end)
    elif fixed_start and fixed_end:
        start, end = fixed_start, fixed_end
    return EphysSweepSetFeatureExtractor(
        t_set, v_set, i_set, start=start, end=end, dv_cutoff=dv_cutoff,
        thresh_frac=thresh_frac, id_set=list(sweep_numbers))


def cell_extractor_for_nwb(dataset, ramps, short_squares, long_squares,
                           subthresh_min_amp=-100):
    """Cell extractor from an NWB dataset (reference :1097-1132): builds
    the three stimulus-family sweep sets, adapting short-square detection
    thresholds to the recording's own noise via
    estimate_adjusted_detection_parameters."""
    if len(short_squares) == 0:
        raise ft.FeatureError('no short square sweep numbers provided')
    if len(ramps) == 0:
        raise ft.FeatureError('no ramp sweep numbers provided')
    if len(long_squares) == 0:
        raise ft.FeatureError('no long_square sweep numbers provided')

    ramps_ext = extractor_for_nwb_sweeps(dataset, ramps,
                                         fixed_start=RAMPS_START)
    temp_ext = extractor_for_nwb_sweeps(dataset, short_squares)
    t_set = [s.t for s in temp_ext.sweeps()]
    v_set = [s.v for s in temp_ext.sweeps()]
    cutoff, thresh_frac = ft.estimate_adjusted_detection_parameters(
        v_set, t_set, SHORT_SQUARES_WINDOW_START, SHORT_SQUARES_WINDOW_END)
    thresh_frac = max(thresh_frac, 0.1)
    short_ext = extractor_for_nwb_sweeps(dataset, short_squares,
                                         dv_cutoff=cutoff,
                                         thresh_frac=thresh_frac)
    long_ext = extractor_for_nwb_sweeps(dataset, long_squares,
                                        fixed_start=LONG_SQUARES_START,
                                        fixed_end=LONG_SQUARES_END)
    return EphysCellFeatureExtractor(ramps_ext, short_ext, long_ext,
                                     subthresh_min_amp)


class EphysCellFeatureExtractor:
    """Aggregate ramp / short-square / long-square sweeps into cell-level
    e-features (reference examples/ephys/ephys_extractor.py:809-1000)."""

    SAG_TARGET = -100.  # mV, deflection at which sag is measured

    def __init__(self, ramps_ext=None, short_squares_ext=None,
                 long_squares_ext=None, subthresh_min_amp=-100.):
        self._ramps = ramps_ext
        self._ramps_all = ramps_ext
        self._short = short_squares_ext
        self._long = long_squares_ext
        self.subthresh_min_amp = subthresh_min_amp
        self._features: Dict[str, float] = {}
        self._spiking_long_squares_ext = None
        self._subthreshold_long_squares_ext = None
        self._subthreshold_membrane_property_ext = None

    def process(self, keys=None):
        """Analyze the requested stimulus families (default: every family
        an extractor was supplied for; reference runs all three and crashes
        on None — we treat an absent family as not requested unless named
        explicitly)."""
        dispatch = {
            'ramps': (self._ramps, self._analyze_ramps),
            'short_squares': (self._short, self._analyze_short_squares),
            'long_squares': (self._long, self._analyze_long_squares),
        }
        if keys is None:
            keys = [k for k, (ext, _) in dispatch.items() if ext is not None]
            if 'long_squares' not in keys:
                raise ValueError('long-square sweeps are required')
        elif not isinstance(keys, list):
            keys = [keys]
        for k in keys:
            if k not in dispatch:
                continue
            ext, fn = dispatch[k]
            if ext is None:
                raise ValueError(f'{k} extractor was not supplied')
            fn()

    # ----------------------------------------------------------- ramps
    def _analyze_ramps(self):
        """Detect spikes on every ramp sweep and keep the spiking ones
        (reference :862-874): ramps have no fixed end-of-stimulus, so the
        cell-level summary is simply the spiking subset's spike features."""
        self._ramps.process_spikes()
        self._ramps_all = self._ramps
        spiking = [s for s in self._ramps.sweeps()
                   if s.sweep_feature('avg_rate') > 0]
        self._ramps = EphysSweepSetFeatureExtractor.from_sweeps(spiking)
        self._features['ramps_n_spiking'] = len(spiking)

    def ramps_features(self, all=False):
        return self._ramps_all if all else self._ramps

    # --------------------------------------------------- short squares
    def _analyze_short_squares(self):
        """Find the most common stimulus amplitude among spiking
        short-square sweeps (ties go to the lower amplitude) and keep only
        sweeps at that amplitude (reference :884-905)."""
        from collections import Counter

        self._short.process_spikes()
        spiking = [s for s in self._short.sweeps()
                   if s.sweep_feature('avg_rate') > 0]
        if not spiking:
            raise ft.FeatureError(
                'No spiking short square sweeps, '
                'cannot compute cell features.')
        counts = Counter(short_step_stim_amp(s) for s in spiking)
        best = max(counts.values())
        common_amp = min(a for a, c in counts.items() if c == best)
        common = [s for s in spiking
                  if short_step_stim_amp(s) == common_amp]
        self._short = EphysSweepSetFeatureExtractor.from_sweeps(common)
        self._features['short_squares_stimulus_amplitude'] = common_amp
        self._features['short_squares_n_common_amp'] = len(common)

    def short_squares_features(self):
        return self._short

    # ---------------------------------------------------- long squares
    def _analyze_long_squares(self):
        if self._long is None:
            raise ValueError('long-square sweeps are required')
        self._long.process_spikes()
        self._process_long_squares()

    def _process_long_squares(self):
        lng = self._long
        sweeps = lng.sweeps()
        amps = lng.sweep_features('stim_amp', allow_missing=True)
        counts = np.array([s.spike_count() for s in sweeps])
        rates = lng.sweep_features('avg_rate')

        feats = self._features
        feats['v_baseline'] = float(np.nanmean(
            lng.sweep_features('v_baseline')))

        # Rheobase: lowest amplitude that elicits >= 1 spike
        spiking = np.flatnonzero(counts > 0)
        if len(spiking):
            rheo_k = spiking[np.argmin(amps[spiking])]
            feats['rheobase_i'] = float(amps[rheo_k])
            feats['rheobase_sweep'] = int(rheo_k)
            rheo_sweep = sweeps[rheo_k]
            feats['latency'] = rheo_sweep.sweep_feature('latency')
        else:
            feats['rheobase_i'] = np.nan
            feats['latency'] = np.nan

        # f-I curve slope: linear fit of rate vs amp on spiking sweeps
        if len(spiking) >= 2:
            A = np.vstack([amps[spiking], np.ones(len(spiking))]).T
            coef, *_ = np.linalg.lstsq(A, rates[spiking], rcond=None)
            feats['fi_fit_slope'] = float(coef[0])
        else:
            feats['fi_fit_slope'] = np.nan

        # Subthreshold: input resistance, tau, sag from hyperpolarizing steps
        sub = np.flatnonzero((counts == 0) & ~np.isnan(amps)
                             & (np.abs(amps) > 1e-9))
        if len(sub) >= 2:
            defl = np.array([sweeps[k]._get_peak_deflection()[0]
                             - sweeps[k]._get_baseline_voltage()
                             for k in sub])
            A = np.vstack([amps[sub], np.ones(len(sub))]).T
            coef, *_ = np.linalg.lstsq(A, defl, rcond=None)
            feats['input_resistance'] = float(coef[0] * 1e3)  # mV/pA -> MOhm
        else:
            feats['input_resistance'] = np.nan
        hyper = [k for k in sub if amps[k] < 0]
        if hyper:
            feats['tau'] = float(np.nanmean(
                [sweeps[k].sweep_feature('tau') for k in hyper]))
            sag_k = hyper[int(np.argmin(
                [abs(sweeps[k]._get_peak_deflection()[0] - self.SAG_TARGET)
                 for k in hyper]))]
            feats['sag'] = sweeps[sag_k].sweep_feature('sag')
        else:
            feats['tau'] = np.nan
            feats['sag'] = np.nan

        # Hero sweep: ~rheobase + 40 pA, for adaptation/ISI structure
        if len(spiking):
            target = feats['rheobase_i'] + 40.
            hero_k = spiking[int(np.argmin(np.abs(amps[spiking] - target)))]
            hero = sweeps[hero_k]
            feats['adaptation'] = hero.sweep_feature('adapt')
            feats['avg_isi'] = hero.sweep_feature('mean_isi')
            feats['mean_rate'] = hero.sweep_feature('avg_rate')
        else:
            feats['adaptation'] = np.nan
            feats['avg_isi'] = np.nan
            feats['mean_rate'] = np.nan

        # Retain the reference's sub-extractor views (:936-975): spiking,
        # subthreshold, and the membrane-property subset (subthreshold
        # sweeps inside the (subthresh_min_amp, 0) amplitude band).
        self._spiking_long_squares_ext = \
            EphysSweepSetFeatureExtractor.from_sweeps(
                [sweeps[k] for k in spiking])
        self._subthreshold_long_squares_ext = \
            EphysSweepSetFeatureExtractor.from_sweeps(
                [sweeps[k] for k in range(len(sweeps)) if counts[k] == 0])
        self._subthreshold_membrane_property_ext = \
            EphysSweepSetFeatureExtractor.from_sweeps(
                [sweeps[k] for k in sub
                 if self.subthresh_min_amp < amps[k] < 0])

    def long_squares_features(self, option=None):
        """The long-square sweep-set (or its 'spiking' / 'subthreshold' /
        'subthreshold_membrane_property' view; reference :977-986)."""
        views = {
            'spiking': self._spiking_long_squares_ext,
            'subthreshold': self._subthreshold_long_squares_ext,
            'subthreshold_membrane_property':
                self._subthreshold_membrane_property_ext,
        }
        return views[option] if option else self._long

    def long_squares_stim_amps(self, option=None) -> np.ndarray:
        """Stimulus amplitudes of the (optionally filtered) long-square
        sweeps (reference :988-999)."""
        ext = self.long_squares_features(option)
        return np.array([step_stim_amp(s) for s in ext.sweeps()])

    def cell_features(self) -> Dict[str, float]:
        return dict(self._features)

    def as_dict(self) -> Dict[str, float]:
        return self.cell_features()
