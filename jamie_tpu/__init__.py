"""jamie_tpu — TPU-native joint variational autoencoders for multimodal
imputation and embedding.

A from-scratch jax/flax/pallas rebuild with the capabilities of
Oafish1/JAMIE (reference layout: jamie/__init__.py exports _meta, jamie,
evaluation). Public surface:

    from jamie_tpu import JAMIE
    jm = JAMIE(min_epochs=500)
    integrated = jm.fit_transform(dataset=[rna, atac])
    imputed_atac = jm.modal_predict(rna, 0)
"""

from .core.cache import enable_persistent_cache as _enable_cache

_enable_cache()

from ._meta import __version__, __reference_version__
from .config import JamieConfig, config_from_kwargs
from .estimator import JAMIE
from . import compare
from . import io
from . import normalize
from . import evaluation
from . import figures
from . import nn_funcs
from . import utils
from .ops.sparse import SparseRows
from .preprocess import PCA, Preprocessor
from .models import CoupledVAE, SimpleCoupledAE

__all__ = [
    '__version__', '__reference_version__',
    'JAMIE', 'JamieConfig', 'config_from_kwargs',
    'compare', 'evaluation', 'figures', 'io', 'nn_funcs', 'normalize',
    'utils',
    'PCA', 'Preprocessor', 'SparseRows', 'CoupledVAE', 'SimpleCoupledAE',
]
