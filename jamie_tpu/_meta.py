"""Package metadata.

Reference parity: jamie/_meta.py (version string export).
"""

__version__ = '0.1.0'
__reference_version__ = '4.4.5'  # Oafish1/JAMIE version this framework tracks
