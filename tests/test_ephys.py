"""Ephys feature extraction on synthetic traces with known ground truth."""

import sys

import numpy as np
import pytest

sys.path.insert(0, '/root/repo/examples')

from ephys import (  # noqa: E402
    EphysCellFeatureExtractor, EphysSweepFeatureExtractor,
    EphysSweepSetFeatureExtractor,
)
from ephys import ephys_features as ft  # noqa: E402


def synth_sweep(n_spikes=5, fs=50_000, dur=1.2, stim_start=0.1,
                stim_end=1.1, amp_pa=100.0, v_rest=-70.0, seed=0,
                spike_times=None):
    """Current-clamp-like trace: RC charging + stereotyped spikes."""
    rng = np.random.RandomState(seed)
    t = np.arange(0, dur, 1.0 / fs)
    v = np.full_like(t, v_rest)
    tau = 0.02
    r_mohm = 0.1  # 100 pA * 0.1 GOhm = 10 mV steady deflection
    step = (t >= stim_start) & (t < stim_end)
    v[step] += amp_pa * r_mohm * (1 - np.exp(-(t[step] - stim_start) / tau))
    after = t >= stim_end
    v_end = amp_pa * r_mohm * (1 - np.exp(-(stim_end - stim_start) / tau))
    v[after] += v_end * np.exp(-(t[after] - stim_end) / tau)

    if spike_times is None:
        spike_times = stim_start + 0.05 + 0.18 * np.arange(n_spikes)
    for st in spike_times:
        if not (stim_start < st < stim_end):
            continue
        idx = int(st * fs)
        rise = int(0.001 * fs)   # 1 ms depolarization to peak
        fall = int(0.0015 * fs)  # 1.5 ms repolarization below baseline
        v[idx:idx + rise] += np.linspace(0, 90, rise)
        v[idx + rise:idx + rise + fall] += np.linspace(90, -8, fall)
        v[idx + rise + fall:idx + rise + fall + int(0.004 * fs)] += \
            np.linspace(-8, 0, int(0.004 * fs))
    v += 0.05 * rng.randn(len(t))
    i = np.where(step, amp_pa, 0.0)
    return t, v, i, np.asarray(
        [st for st in spike_times if stim_start < st < stim_end])


def test_spike_detection_count():
    t, v, i, true_times = synth_sweep(n_spikes=5)
    ext = EphysSweepFeatureExtractor(t=t, v=v, i=i, start=0.1, end=1.1)
    ext.process_spikes()
    assert ext.spike_count() == len(true_times)


def test_spike_times_accurate():
    t, v, i, true_times = synth_sweep(n_spikes=4)
    ext = EphysSweepFeatureExtractor(t=t, v=v, i=i, start=0.1, end=1.1)
    ext.process_spikes()
    det = ext.spike_feature('threshold_t')
    assert np.all(np.abs(det - true_times) < 0.002)


def test_spike_shape_features():
    t, v, i, _ = synth_sweep(n_spikes=3)
    ext = EphysSweepFeatureExtractor(t=t, v=v, i=i, start=0.1, end=1.1)
    ext.process_spikes()
    peaks = ext.spike_feature('peak_v')
    assert np.all(peaks > 0)          # ~ +20 mV synthetic peaks
    ups = ext.spike_feature('upstroke')
    downs = ext.spike_feature('downstroke')
    assert np.all(ups > 20)           # sharp rise
    assert np.all(downs < 0)
    ratio = ext.spike_feature('upstroke_downstroke_ratio')
    assert np.all(ratio > 0)
    widths = ext.spike_feature('width')
    valid = widths[~np.isnan(widths)]
    assert np.all((valid > 1e-4) & (valid < 5e-3))


def test_sweep_features():
    t, v, i, true_times = synth_sweep(n_spikes=5)
    ext = EphysSweepFeatureExtractor(t=t, v=v, i=i, start=0.1, end=1.1)
    ext.process_spikes_and_features()
    rate = ext.sweep_feature('avg_rate')
    assert rate == pytest.approx(len(true_times) / 1.0, abs=0.5)
    lat = ext.sweep_feature('latency')
    assert lat == pytest.approx(true_times[0] - 0.1, abs=0.005)
    isis = np.diff(true_times)
    assert ext.sweep_feature('mean_isi') == pytest.approx(
        float(np.mean(isis)), rel=0.05)
    assert ext.sweep_feature('v_baseline') == pytest.approx(-70, abs=1)
    assert ext.sweep_feature('stim_amp') == pytest.approx(100, abs=2)


def test_subthreshold_tau_and_resistance():
    t, v, i, _ = synth_sweep(n_spikes=0, amp_pa=-80)
    ext = EphysSweepFeatureExtractor(t=t, v=v, i=i, start=0.1, end=1.1)
    ext.process_spikes_and_features()
    assert ext.spike_count() == 0
    tau = ext.sweep_feature('tau')
    assert tau == pytest.approx(0.02, rel=0.5)


def test_cell_extractor_long_squares():
    amps = [-80, -40, 40, 80, 120, 160]
    n_spk = {40: 0, 80: 2, 120: 5, 160: 8}
    t_set, v_set, i_set = [], [], []
    for amp in amps:
        k = n_spk.get(amp, 0)
        times = 0.15 + 0.09 * np.arange(k) if k else []
        t, v, i, _ = synth_sweep(n_spikes=k, amp_pa=amp, spike_times=times,
                                 seed=abs(amp))
        t_set.append(t); v_set.append(v); i_set.append(i)
    lng = EphysSweepSetFeatureExtractor(
        t_set, v_set, i_set, start=0.1, end=1.1)
    cell = EphysCellFeatureExtractor(long_squares_ext=lng)
    cell.process()
    feats = cell.cell_features()
    assert feats['rheobase_i'] == pytest.approx(80, abs=5)
    assert feats['fi_fit_slope'] > 0
    assert feats['v_baseline'] == pytest.approx(-70, abs=1.5)
    assert np.isfinite(feats['input_resistance'])
    assert np.isfinite(feats['adaptation']) or np.isnan(feats['adaptation'])


def _ramp_sweep(spiking, seed=0):
    """Ramp stimulus: current rises linearly from onset; spikes late."""
    times = (0.6 + 0.12 * np.arange(3)) if spiking else []
    t, v, i, _ = synth_sweep(spike_times=times, seed=seed)
    ramp = np.zeros_like(t)
    on = t >= 0.1
    ramp[on] = 200.0 * (t[on] - 0.1)
    return t, v, ramp


def _short_square_sweep(amp, spiking, seed=0):
    """3 ms current pulse at `amp` pA; optional single spike right after."""
    times = [0.108] if spiking else []
    t, v, i, _ = synth_sweep(spike_times=times, seed=seed, amp_pa=0.0)
    pulse = np.where((t >= 0.1) & (t < 0.103), amp, 0.0)
    return t, v, pulse


def test_cell_extractor_ramps():
    t_set, v_set, i_set = [], [], []
    for spk, seed in ((True, 1), (False, 2), (True, 3)):
        t, v, i = _ramp_sweep(spk, seed)
        t_set.append(t); v_set.append(v); i_set.append(i)
    ramps = EphysSweepSetFeatureExtractor(t_set, v_set, i_set,
                                          start=0.1, end=1.1)
    cell = EphysCellFeatureExtractor(ramps_ext=ramps)
    cell.process(keys='ramps')
    assert cell.cell_features()['ramps_n_spiking'] == 2
    assert len(cell.ramps_features().sweeps()) == 2
    assert len(cell.ramps_features(all=True).sweeps()) == 3


def test_cell_extractor_short_squares():
    """Most-common spiking amplitude wins; ties go to the lower amplitude."""
    sweeps = [(60., True), (60., True), (80., True), (80., True),
              (40., False)]
    t_set, v_set, i_set = [], [], []
    for k, (amp, spk) in enumerate(sweeps):
        t, v, i = _short_square_sweep(amp, spk, seed=k)
        t_set.append(t); v_set.append(v); i_set.append(i)
    short = EphysSweepSetFeatureExtractor(t_set, v_set, i_set,
                                          start=0.1, end=1.1)
    cell = EphysCellFeatureExtractor(short_squares_ext=short)
    cell.process(keys='short_squares')
    feats = cell.cell_features()
    assert feats['short_squares_stimulus_amplitude'] == pytest.approx(60.)
    assert feats['short_squares_n_common_amp'] == 2
    assert len(cell.short_squares_features().sweeps()) == 2


def test_cell_extractor_short_squares_none_spiking():
    t, v, i = _short_square_sweep(40., False)
    short = EphysSweepSetFeatureExtractor([t], [v], [i], start=0.1, end=1.1)
    cell = EphysCellFeatureExtractor(short_squares_ext=short)
    with pytest.raises(ft.FeatureError):
        cell.process(keys='short_squares')


def test_isi_utilities():
    isis = np.array([0.1, 0.12, 0.15, 0.2])
    ai = ft.adaptation_index(isis)
    assert 0 < ai < 0.3
    assert len(ft.get_isis([0, 1, 2], [])) == 0


def test_pause_detection():
    isis = np.array([0.1, 0.1, 0.1, 0.8, 0.1, 0.1, 0.11, 0.09, 0.1])
    pauses = ft.detect_pauses(isis, None)
    assert 3 in pauses


def test_burst_detection():
    # bursts of short ISIs separated by long ones
    isis = np.array([0.01, 0.012, 0.011, 0.5, 0.01, 0.012, 0.013, 0.5, 0.4])
    bursts = ft.detect_bursts(isis, None, None, None, None, None, None)
    assert len(bursts) >= 1
    assert all(b[0] > 1 for b in bursts)  # burst rate above baseline


def test_trough_details_isi_types():
    t, v, i, true_times = synth_sweep(n_spikes=4)
    ext = EphysSweepFeatureExtractor(t=t, v=v, i=i, start=0.1, end=1.1)
    ext.process_spikes()
    isi_types = ext.spike_feature('isi_type')
    # all but possibly the last spike get a classification
    assert sum(x is not None for x in isi_types) >= len(isi_types) - 1
    fast_v = ext.spike_feature('fast_trough_v')
    assert np.nanmin(fast_v) < -50  # repolarizes below threshold


def test_sweep_set_aggregation():
    t_set, v_set, i_set = [], [], []
    for k, amp in ((2, 80), (5, 120)):
        times = 0.15 + 0.1 * np.arange(k)
        t, v, i, _ = synth_sweep(n_spikes=k, amp_pa=amp, spike_times=times)
        t_set.append(t); v_set.append(v); i_set.append(i)
    sset = EphysSweepSetFeatureExtractor(t_set, v_set, i_set,
                                         start=0.1, end=1.1)
    sset.process_spikes()
    rates = sset.sweep_features('avg_rate')
    assert rates[1] > rates[0] > 0
    peaks = sset.spike_feature_averages('peak_v')
    assert np.isfinite(peaks).all()


def test_estimate_adjusted_detection_parameters():
    t, v, i, _ = synth_sweep(n_spikes=3)
    dv_cutoff, thresh_frac = ft.estimate_adjusted_detection_parameters(
        [v], [t], 0.0, 0.05)
    assert dv_cutoff >= 20.0
    assert 0 < thresh_frac <= 0.2
