from .prime_dual import prime_dual
from .assignment import hungarian_pairs

__all__ = ['prime_dual', 'hungarian_pairs']
