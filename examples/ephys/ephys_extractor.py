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

    def spike_feature(self, key: str, include_clipped=False) -> np.ndarray:
        assert self._spikes_df is not None, 'spikes not processed yet'
        if key not in self._spikes_df:
            if len(self._spikes_df.get('threshold_index', [])) == 0:
                return np.array([])
            raise KeyError(f'feature {key} not available')
        vals = np.asarray(self._spikes_df[key])
        if not include_clipped and 'clipped' in self._spikes_df \
                and len(vals) == len(self._spikes_df['clipped']):
            # AllenSDK semantics: clipped (window-truncated) spikes are
            # excluded unless explicitly requested
            return vals[~np.asarray(self._spikes_df['clipped'], bool)]
        return vals

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

    def cell_features(self) -> Dict[str, float]:
        return dict(self._features)

    def as_dict(self) -> Dict[str, float]:
        return self.cell_features()
