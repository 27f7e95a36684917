from .losses import (
    LOSS_NAMES, kl_anneal, kl_divergence, reconstruction_loss,
    latent_consistency_loss, f_reconstruction_loss, row_normalize,
)
from .sampling import detect_sampling_method, make_sampler
from .trainer import JamieTrainer, TrainState

__all__ = [
    'LOSS_NAMES', 'kl_anneal', 'kl_divergence', 'reconstruction_loss',
    'latent_consistency_loss', 'f_reconstruction_loss', 'row_normalize',
    'detect_sampling_method', 'make_sampler', 'JamieTrainer', 'TrainState',
]
