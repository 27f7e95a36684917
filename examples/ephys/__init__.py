"""Intracellular electrophysiology feature extraction.

Capability-parity package for the reference's examples/ephys (Allen-SDK-style
sweep/sweep-set/cell extractors used to build the scMNC e-feature modality;
reference: examples/ephys/ephys_extractor.py, ephys_features.py). This is an
independent numpy/scipy implementation of the same feature definitions.
"""

from .ephys_features import (
    adaptation_index, average_rate, average_voltage, calculate_dvdt,
    detect_bursts, detect_pauses, detect_putative_spikes,
    filter_putative_spikes, find_downstroke_indexes, find_peak_indexes,
    find_time_index, find_trough_indexes, find_upstroke_indexes,
    find_widths, fit_membrane_time_constant, get_isis, latency,
    refine_threshold_indexes,
)
from .ephys_extractor import (
    EphysCellFeatureExtractor, EphysSweepFeatureExtractor,
    EphysSweepSetFeatureExtractor,
)

__all__ = [
    'EphysSweepFeatureExtractor', 'EphysSweepSetFeatureExtractor',
    'EphysCellFeatureExtractor',
    'detect_putative_spikes', 'find_peak_indexes', 'filter_putative_spikes',
    'find_upstroke_indexes', 'refine_threshold_indexes',
    'find_trough_indexes', 'find_downstroke_indexes', 'find_widths',
    'find_time_index', 'calculate_dvdt', 'get_isis', 'average_voltage',
    'adaptation_index', 'latency', 'average_rate',
    'fit_membrane_time_constant', 'detect_pauses', 'detect_bursts',
]
