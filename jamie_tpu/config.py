"""Configuration for the JAMIE-TPU estimator.

The reference spreads configuration over three tiers: JAMIE constructor
kwargs (jamie/jamie.py:38-62), default-overrides pushed into the UnionCom
base-class kwargs (jamie/jamie.py:98-109), and inherited UnionCom
constructor params (used at jamie/jamie.py:129-139,142,354-412,511,546).
Here everything the training/solver path actually reads is owned by a single
frozen dataclass, which doubles as the canonical cache key
(`hash_kwargs`-style, jamie/utilities.py:610-636).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from typing import Any, Optional, Sequence, Tuple

DISTANCE_MODES = (
    # Pairwise (sklearn-compatible metric names; jamie/jamie.py:117-127)
    'euclidean', 'l2', 'l1', 'manhattan', 'cityblock', 'braycurtis',
    'canberra', 'chebyshev', 'correlation', 'cosine', 'dice', 'hamming',
    'jaccard', 'kulsinski', 'mahalanobis', 'matching', 'minkowski',
    'rogerstanimoto', 'russellrao', 'seuclidean', 'sokalmichener',
    'sokalsneath', 'sqeuclidean', 'yule', 'wminkowski', 'nan_euclidean',
    'haversine',
    # Non-pairwise
    'geodesic', 'spearman', 'pearson',
)

SAMPLING_METHODS = ('diag', 'hybrid', 'zeros')


@dataclasses.dataclass(frozen=True)
class JamieConfig:
    """All knobs of the JAMIE fit, with reference defaults.

    Fields mirror the reference constructor (jamie/jamie.py:38-62) plus the
    inherited UnionCom params the JAMIE path reads (SURVEY.md section 2.2).
    """

    # --- Model / projection (jamie/jamie.py:38-62) ---
    output_dim: int = 32
    pca_dim: Optional[Tuple[Optional[int], ...]] = (512, 512)
    model_pca: str = 'pca'            # 'pca' | 'tsne' (device) | 'umap'
    # Randomized-PCA power iterations on the ROW-STREAMED (tall atlas)
    # route, where each iteration costs two extra full passes over the
    # on-chip CSR decode (~9.2M nnz/s, serialized scatter — RESULTS.md
    # round 4). 1 matches the other randomized routes; 0 halves the
    # decode passes when the data's spectrum decays fast (exact for
    # effective rank < pca_dim + oversample either way).
    pca_power_iters: int = 1
    dropout: Optional[float] = None   # None -> 0.6 if max(dim) > 64 else 0
    dist_method: str = 'euclidean'    # similarity used in the cosine loss term
    PF_Ratio: Optional[float] = None  # None -> 1.0 (jamie/jamie.py:517)
    loss_weights: Optional[Tuple[float, ...]] = None

    # --- Training loop (jamie/jamie.py:48-62,98-109) ---
    model_lr: float = 1e-3
    epoch_DNN: int = 10000
    batch_size: int = 512
    batch_step: bool = True
    min_epochs: int = 2500
    min_increment: float = 1e-8
    max_steps_without_increment: int = 500
    use_early_stop: bool = True
    log_DNN: int = 500
    log_debug: int = 100
    debug: bool = False
    record_loss: bool = True

    # --- Correspondence solver (UnionCom-inherited; jamie/jamie.py:314-414) ---
    use_f_tilde: bool = True
    corr_method: str = 'unioncom'     # 'unioncom' | 'jamie' (low-rank, WIP in ref)
    # 2000 is the pinned unioncom 0.4.0 default the reference actually ran:
    # every committed notebook output prints epoch:[2000/2000] with no
    # epoch_pd kwarg passed (e.g. scGLUE.ipynb cell 8), so the wall-clock
    # baselines in BASELINE.md are iteration-matched to this default.
    epoch_pd: int = 2000
    epsilon: float = 0.001            # prime-dual step size
    rho: float = 10.0                 # augmented-lagrangian penalty
    delay: int = 0                    # iterations before scale factor updates
    log_pd: int = 500
    # Landmark (Nystrom) correspondence: run the exact prime-dual solver on
    # an L x L landmark subproblem and extend with kNN-Gaussian weights,
    # returning F as a LowRankF factorization (solvers/landmark.py). None =
    # auto: engages past estimator.LANDMARK_AUTO_ENTRIES (~22.8k x 22.8k
    # with the bf16-state band, round 5),
    # where the dense O(N0*N1) solver state cannot fit one chip (the
    # reference never ran there, SURVEY §6/7); an int forces the landmark
    # path with that L at any size (A/B testing).
    corr_landmarks: Optional[int] = None
    corr_landmark_k: int = 8          # interpolation kNN fan-in
    # 'fps' = farthest-point cover (better geometric coverage: ~1.35x
    # better true-match rank than 'uniform' at L/N=0.2, measured in
    # examples/landmark_ab.py --selection-ab); 'uniform' = plain subsampling
    corr_landmark_selection: str = 'fps'
    # Landmark factor layout: 'dense' = LowRankF (U, V materialized, N x L
    # f32 each), 'sparse' = SparseLandmarkF (k-sparse interpolation factors,
    # O(N k) memory — the 500k+ cell regime), 'auto' = sparse once N x L
    # crosses solvers.landmark._SPARSE_FACTOR_ENTRIES.
    corr_factor_layout: str = 'auto'

    # --- Distances (jamie/jamie.py:839-890) ---
    distance_mode: str = 'geodesic'   # UnionCom-inherited default
    kmax: int = 40                    # geodesic kNN cap
    perplexity: float = 30.0          # legacy tsne path
    # Legacy tsne projection schedule (project_mode='tsne'; the UnionCom
    # baseline rides this path — solvers/tsne.py)
    tsne_iters: int = 1000
    tsne_align_weight: float = 10.0
    tsne_lr: float = 0.5
    tsne_exaggeration: float = 12.0

    # --- Misc ---
    manual_seed: int = 666
    integration_type: str = 'MultiOmics'
    project_mode: str = 'jamie'
    in_place: bool = False
    enable_memory_logging: bool = False

    # --- TPU-native knobs (no reference equivalent) ---
    compute_dtype: str = 'float32'    # 'float32' | 'bfloat16' model compute
    # Model matmuls only in bf16 with f32 accumulation (MXU-native rate);
    # activations/batchnorm/losses stay f32 — a far smaller quality
    # perturbation than compute_dtype='bfloat16'
    model_matmul_dtype: str = 'float32'   # 'float32' | 'bfloat16'
    # Prime-dual matmul precision: 'bfloat16' = MXU-native bf16 inputs with
    # f32 accumulation (the solver state stays f32; the projection/fixed-
    # point iteration tolerates reduced matmul precision — quality validated
    # on real scGEM). 'float32' forces 6-pass exact-f32 matmuls.
    solver_dtype: str = 'bfloat16'
    # Prime-dual STATE storage: 'bfloat16' persists the first moment +
    # carried products and the K operands in bf16 between iterations
    # (arithmetic stays f32; F and M2 stay f32 — their per-step updates
    # are below bf16 ulp, see solvers/prime_dual.py). 28 -> 18 bytes per
    # N^2 entry raises the one-chip dense-N ceiling (measured f32 PASS
    # 441M entries / bf16 PASS 625M, examples/pd_dense_ceiling_probe.py).
    # 'auto' (default): f32 up to estimator.DENSE_F32_STATE_ENTRIES,
    # bf16 in the band up to LANDMARK_AUTO_ENTRIES — so every fit that
    # worked before keeps exact f32 state, and the 250-520M-entry band
    # that previously fell to the landmark path runs dense. Quality A/B
    # seed-neutral on scGEM: examples/pd_state_bf16_ab.py (round 5).
    solver_state_dtype: str = 'auto'
    epoch_chunk: int = 100            # epochs per scan-compiled chunk
    # Chunks kept in flight past the one being read back: the host fetches
    # chunk k's (tiny) loss outputs while the device already runs k+1..k+1+L,
    # hiding the per-chunk device->host round-trip (a ~0.35 s tunnel latency
    # on axon) behind compute. Post-stop epochs are lax.cond no-ops on
    # device, so the <= L chunks dispatched after an early stop cost ~0.
    # 0 = fully sequential (also forced whenever checkpoint_every is set,
    # because mid-fit snapshots need the state at the processed boundary).
    dispatch_lookahead: int = 3
    mesh_shape: Optional[Tuple[int, ...]] = None   # None -> all devices on 'data'
    mesh_axis_names: Tuple[str, ...] = ('data',)
    true_ratio: float = 0.8           # hybrid-sampling corr fraction (jamie.py:529)
    # Compress the solver's dense F to its k largest entries per row before
    # training (SparseRows top-k): bounds trainer memory at O(N k) for
    # atlas-scale partial-prior fits. None keeps F dense.
    f_top_k: Optional[int] = None
    # Tensor parallelism: parameter dims >= this (and divisible by the
    # 'model' mesh axis) shard over it (core/mesh.py param_spec rules)
    tp_wide_threshold: int = 1024
    # PRNG implementation for the whole fit ('rbg' = TPU hardware RNG).
    # Dropout's threefry bits are 31% of a train step at the bench config;
    # rbg removes nearly all of it (842k -> 1242k cell-samples/s) and is
    # quality-neutral on scGEM. Applied via the jax global config for the
    # duration of init/fit and restored afterwards (trainer._prng_scope).
    prng_impl: Optional[str] = None   # None | 'rbg' | 'threefry2x32'
    # Preemption safety net (trainer.fit passthrough; no reference
    # equivalent — its only restartability is notebook-level model caching,
    # jamie/utilities.py:610-636): periodic full-TrainState snapshots under
    # checkpoint_dir every checkpoint_every epochs, and a structured JSONL
    # metrics record per scan chunk at metrics_path. Excluded from the
    # cache key: they change where telemetry lands, not the fit.
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 0
    metrics_path: Optional[str] = None

    def __post_init__(self):
        if self.integration_type != 'MultiOmics':
            raise ValueError("integration_type error! Enter MultiOmics.")
        if self.distance_mode not in DISTANCE_MODES:
            raise ValueError('distance_mode error! Enter a correct distance_mode.')
        if self.project_mode not in ('jamie', 'tsne'):
            raise ValueError("Choose correct project_mode: 'jamie', 'tsne'.")
        if self.model_pca not in ('pca', 'umap', 'tsne'):
            raise ValueError("model_pca must be one of 'pca', 'umap', 'tsne'.")
        if self.corr_method not in ('unioncom', 'jamie'):
            raise ValueError("corr_method must be 'unioncom' or 'jamie'.")
        # Normalize sequences to tuples so the config hashes canonically
        if self.loss_weights is not None and not isinstance(self.loss_weights, tuple):
            object.__setattr__(self, 'loss_weights', tuple(self.loss_weights))
        if self.pca_dim is not None and not isinstance(self.pca_dim, tuple):
            object.__setattr__(self, 'pca_dim', tuple(self.pca_dim))

    def replace(self, **kw) -> 'JamieConfig':
        return dataclasses.replace(self, **kw)

    # --- canonical hashing (reference: hash_kwargs, jamie/utilities.py:610-636) ---
    def nondefault_kwargs(self) -> dict:
        """Dict of fields that differ from the defaults."""
        default = JamieConfig()
        out = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if v != getattr(default, f.name):
                out[f.name] = v
        return out

    def cache_key(self, dataset_name: str, shapes: Sequence[Tuple[int, int]]) -> str:
        """Canonical string for cache filenames, like the reference's hash_kwargs."""
        size_str = '---'.join(
            [dataset_name] + ['-'.join(str(s) for s in shape) for shape in shapes])
        kw = {k: v for k, v in sorted(self.nondefault_kwargs().items())
              if k not in ('enable_memory_logging', 'debug', 'record_loss',
                           'checkpoint_dir', 'checkpoint_every',
                           'metrics_path')}
        if not kw:
            return size_str
        blob = json.dumps(kw, sort_keys=True, default=str)
        digest = hashlib.sha1(blob.encode()).hexdigest()[:10]
        return f'{size_str}---{digest}'


# UnionCom constructor params the reference accepted but the JAMIE path never
# reads (jamie/jamie.py:111 forwards **kwargs to uc.UnionCom.__init__); they
# pass through without a warning for drop-in compatibility.
_INERT_REFERENCE_KWARGS = frozenset((
    'epoch_pd1', 'beta', 'usePercent', 'col', 'row', 'test', 'gpu_number',
))


def config_from_kwargs(**kwargs: Any) -> JamieConfig:
    """Build a config from loose reference-style kwargs.

    Unknown kwargs warn instead of raising: the reference silently forwarded
    them to UnionCom, so strictness would break drop-in use — but silence
    turns a typo (`epoch_DNN` -> `epoch_dnn`) into a 10k-epoch default run
    with no clue why, so every key that is neither a config field nor a
    known inert UnionCom param gets a UserWarning naming it.
    """
    field_names = {f.name for f in dataclasses.fields(JamieConfig)}
    known = {k: v for k, v in kwargs.items() if k in field_names}
    # Reference alias: `lr` was the UnionCom name forwarded for the DNN phase
    if 'lr' in kwargs and 'model_lr' not in kwargs:
        known['model_lr'] = kwargs['lr']
    elif 'lr' in kwargs and kwargs['lr'] != kwargs['model_lr']:
        import warnings
        warnings.warn(
            f"Both lr={kwargs['lr']} and model_lr={kwargs['model_lr']} "
            'given; lr is the reference alias for model_lr and is ignored '
            'when both are present.', UserWarning, stacklevel=3)
    unknown = sorted(k for k in kwargs
                     if k not in field_names and k != 'lr'
                     and k not in _INERT_REFERENCE_KWARGS)
    if unknown:
        import warnings
        warnings.warn(
            f'Ignoring unknown JAMIE kwargs: {unknown} — not a JamieConfig '
            'field (check for typos; see jamie_tpu.config.JamieConfig).',
            UserWarning, stacklevel=3)
    return JamieConfig(**known)
