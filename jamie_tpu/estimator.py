"""The JAMIE estimator — the public scikit-learn-style API.

Reference parity: class `JAMIE` (jamie/jamie.py:29-972). Same surface:
`fit_transform(dataset, P)`, `match`, `Prime_Dual`, `project_jamie`,
`modal_predict`, `transform`, `transform_one`, `compute_distances`,
`test_closer`, `test_label_dist`, `test_LabelTA`, `save_model`,
`load_model`, `Visualize`. The UnionCom base class disappears — everything
the JAMIE path used from it (SURVEY.md section 2.2) is owned here.

TPU-first: distances/F-solver/training all run on device; the estimator is a
thin host orchestration layer holding numpy views, the fitted flax params,
and array-based preprocessors.
"""

from __future__ import annotations

import warnings
from itertools import product
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ._meta import __version__
from .config import JamieConfig, config_from_kwargs
from .core.mesh import create_mesh
from .core.timing import TimeLogger
from .models.coupled_vae import CoupledVAE
from .ops.distances import dataset_distance_matrix
from .preprocess import Preprocessor
from .persistence import load_checkpoint, save_checkpoint
from .solvers.assignment import hungarian_pairs
from .solvers.prime_dual import prime_dual
from .train.trainer import JamieTrainer


# Past this many N0*N1 entries, dense all-zeros F / identity P matrices are
# pure waste (200+ MB); string sentinels flow instead and the trainer
# synthesizes batch subsets on the fly.
SENTINEL_ENTRIES = 50_000_000

# Dense prime-dual state-dtype thresholds (solver_state_dtype='auto').
# Up to 250M (N0, N1) entries the state is exact f32 (28 B/entry; the
# measured one-chip f32 ceiling is 441M at N=21k — 250M keeps headroom
# for co-resident data/distance buffers in a real fit). In the band up
# to LANDMARK_AUTO_ENTRIES the state stores M1 + carried products + K
# operands in bf16 (18 B/entry; quality seed-neutral on scGEM —
# examples/pd_state_bf16_ab.py), which is what raises the dense ceiling.
DENSE_F32_STATE_ENTRIES = 250_000_000

# Landmark auto-engage threshold: with bf16 state the dense solver's
# measured one-chip PASS is 625M entries (N=25k, 50-epoch probe,
# examples/pd_dense_ceiling_probe.py round 5); 520M (~22.8k x 22.8k,
# 2.1x the round-4 ceiling) keeps margin for co-resident buffers. Below
# it dense stays the default (exact semantics); above it the landmark
# low-rank path engages automatically. corr_landmarks forces the
# landmark path at any size.
LANDMARK_AUTO_ENTRIES = 520_000_000


def _unwrap_anndata(dataset):
    """AnnData unwrap (jamie/jamie.py:147-149). Duck-typed on `.X`+`.obs`
    so it covers anndata.AnnData (optional dep) and jamie_tpu.io.H5adData
    (the native h5ad reader) alike — either feeds fit_transform directly."""
    if dataset and all(hasattr(d, 'X') and hasattr(d, 'obs')
                       for d in dataset):
        return [d.X for d in dataset], dataset
    return dataset, None


class JAMIE:
    """Joint variational autoencoders for multimodal imputation & embedding,
    re-built TPU-native on jax/flax/pallas.

    Constructor accepts the reference's kwargs (jamie/jamie.py:38-62) plus the
    UnionCom-inherited ones the fit path reads; see `JamieConfig`.
    """

    def __init__(self, match_result=None, mesh=None,
                 use_mesh: Optional[bool] = None, **kwargs):
        if 'device' in kwargs:
            kwargs.pop('device')  # TPU build: placement is jax's job
        self.P = kwargs.pop('P', None)
        self.config = config_from_kwargs(**kwargs)
        self.match_result = match_result
        self.mesh = mesh
        # use_mesh=None (default) auto-enables sharding whenever more than
        # one device is visible, so a flag-free JAMIE().fit_transform shards
        # every O(N^2) phase (solver, distances, training batches) over the
        # 'data' axis. Pass use_mesh=False to force single-device execution.
        if use_mesh is None:
            use_mesh = True
        if mesh is None and use_mesh and len(jax.devices()) > 1:
            self.mesh = create_mesh(shape=self.config.mesh_shape,
                                    axis_names=self.config.mesh_axis_names)
        self.model: Optional[CoupledVAE] = None
        self.params = None
        self.batch_stats = None
        self.preprocessors: Optional[Sequence[Preprocessor]] = None
        self.dataset_num = 2
        self.loss_history = {}
        self.dist = None
        self.trainer: Optional[JamieTrainer] = None

    # ------------------------------------------------------------------ fit
    def fit_transform(self, dataset=None, P=None):
        """Full pipeline: distances -> correspondence F -> coupled-VAE
        training -> integrated embeddings (jamie/jamie.py:113-222)."""
        cfg = self.config
        if P is not None:
            self.P = P

        time = TimeLogger(memory_usage=cfg.enable_memory_logging, block=True)
        np.random.seed(cfg.manual_seed)

        self.dataset, self.dataset_annotation = _unwrap_anndata(dataset)
        # Documented deviation: the reference copies unless in_place to
        # protect caller data from its in-place scaling (jamie/jamie.py:152)
        # — this pipeline never writes into the input arrays (the residency
        # layer's read-only contract), so both settings alias them. Copying
        # would materialize memmap-backed atlases (scGLUE's 8.9 GB ATAC) on
        # host for nothing. scipy-sparse modalities stay sparse (normalized
        # to CSR for the row-streamed device paths) — the reference densifies
        # at load (scGLUE.ipynb cell 3 .todense()); here the dense matrix
        # never exists on host.
        from .core.hostmat import ensure_row_major, is_scipy_sparse
        # ndarrays (incl. np.memmap) pass through AS-IS: np.asarray on a
        # memmap returns a base-class view, dropping .filename — which is
        # the key the on-disk encode cache needs. This entry point was the
        # remaining stripper after the distances/preprocess call sites were
        # fixed (the warm bench still paid the full ~35 s host encode).
        self.dataset = [ensure_row_major(d) if is_scipy_sparse(d)
                        else (d if isinstance(d, np.ndarray)
                              else np.asarray(d))
                        for d in self.dataset]

        self.dataset_num = len(self.dataset)
        assert self.dataset_num == 2, (
            'Currently only compatible with 2 modalities.')
        self.row = [int(np.shape(d)[0]) for d in self.dataset]
        self.col = [int(np.shape(d)[1]) for d in self.dataset]

        # Landmark correspondence path: the dense N x N distance matrices
        # exist only to feed the dense solver; the landmark solver builds
        # its own L x L matrices, so skip them entirely (auto past
        # LANDMARK_AUTO_ENTRIES where the dense solver state cannot fit).
        self._use_landmarks = (
            cfg.use_f_tilde and self.match_result is None
            and (cfg.corr_landmarks is not None
                 or self.row[0] * self.row[1] > LANDMARK_AUTO_ENTRIES))
        self.compute_distances(save_dist=(
            cfg.project_mode in ['tsne']
            or (self.match_result is None and cfg.use_f_tilde
                and not self._use_landmarks)))
        time.log('Distance')

        if not cfg.use_f_tilde:
            # Above SENTINEL_ENTRIES the zero matrix is pure waste; pass the
            # sentinel the trainer synthesizes batch subsets from.
            if self.row[0] * self.row[1] > SENTINEL_ENTRIES:
                self.match_result = ['zeros']
            else:
                self.match_result = [
                    np.zeros([d.shape[0] for d in self.dataset], np.float32)]
        if self.match_result is None:
            self.match_result = self.match()
        # Hard pairs (hungarian, O(N^3) host) feed only the legacy tsne
        # projection (jamie.py:195); the reference computes them
        # unconditionally (jamie.py:175-181) which costs minutes at 9k+
        # cells for nothing — here they're lazy.
        self.pairs_x, self.pairs_y = [], []
        if cfg.project_mode == 'tsne':
            from .ops.sparse import SparseRows
            for i in range(self.dataset_num - 1):
                mat = self.match_result[i]
                if isinstance(mat, str):
                    # All-zeros sentinel: hungarian on a zero cost matrix is
                    # the leading diagonal, so synthesize it without ever
                    # materializing the N x N matrix.
                    k = min(self.row[i], self.row[i + 1])
                    self.pairs_x.append(np.arange(k))
                    self.pairs_y.append(np.arange(k))
                    continue
                if isinstance(mat, SparseRows):
                    mat = mat.to_dense()  # hungarian needs the dense cost
                from .ops.lowrank import LowRankF
                if isinstance(mat, LowRankF):
                    # O(N^3) hungarian is host-bound and needs the dense
                    # cost; to_dense guards against absurd sizes itself
                    mat = mat.to_dense()
                row_ind, col_ind = hungarian_pairs(mat)
                self.pairs_x.append(row_ind)
                self.pairs_y.append(col_ind)
        time.log('Correspondence')

        if cfg.project_mode == 'tsne':
            # Legacy UnionCom path (jamie/jamie.py:184-195): PCA-50 front
            # end, perplexity-calibrated joint probabilities, pair-aligned
            # t-SNE — all on device (solvers/tsne.py).
            from .preprocess import PCA
            from .solvers.tsne import joint_probabilities, project_tsne
            P_joint = [joint_probabilities(self.dist[i], cfg.perplexity)
                       for i in range(self.dataset_num)]
            from .core.hostmat import densify, is_scipy_sparse
            for i in range(self.dataset_num):
                if self.col[i] > 50:
                    self.dataset[i] = PCA(n_components=50).fit_transform(
                        self.dataset[i])
                    self.col[i] = 50
                elif is_scipy_sparse(self.dataset[i]):
                    self.dataset[i] = densify(self.dataset[i])
            integrated_data = project_tsne(
                self.dataset, P_joint, self.pairs_x[0], self.pairs_y[0],
                output_dim=cfg.output_dim, n_iters=cfg.tsne_iters,
                align_weight=cfg.tsne_align_weight, lr=cfg.tsne_lr,
                exaggeration=cfg.tsne_exaggeration)
            time.log('Mapping')
            print('-' * 33)
            print('JAMIE Done!')
            time.aggregate()
            time.stop()
            return integrated_data
        match_matrix = [[None for _ in range(self.dataset_num)]
                        for _ in range(self.dataset_num)]
        k = 0
        for i, j in product(*(2 * [range(self.dataset_num)])):
            if i == j:
                mat = None
            elif i > j:
                # The lower-triangle slots mirror the reference's structure
                # (jamie.py:196-212) but no consumer reads them —
                # project_jamie uses W[0][1] only — so don't schedule the
                # ~324 MB device transpose (or an O(nnz) SparseRows
                # re-bucket) for a slot that is never touched.
                mat = None
            else:
                mat = self.match_result[k]
                k += 1
            match_matrix[i][j] = mat
        integrated_data = self.project_jamie(match_matrix)
        time.log('Mapping')

        print('-' * 33)
        print('JAMIE Done!')
        time.aggregate()
        # Per-phase wall-clock for programmatic consumers (bench.py reports
        # it so transfer-bound phases are attributable under tunnel noise)
        self.phase_timings = {k: round(float(v), 3)
                              for k, v in time.totals().items()}
        time.stop()
        print()
        return integrated_data

    # ------------------------------------------------------------ distances
    def compute_distances(self, save_dist: bool = True):
        """Per-dataset distance matrices (jamie/jamie.py:839-890)."""
        cfg = self.config
        if save_dist:
            self.dist = []
        print('Shape of Raw data')
        for i in range(self.dataset_num):
            print('Dataset {}:'.format(i), np.shape(self.dataset[i]))
            if save_dist:
                self.dist.append(dataset_distance_matrix(
                    self.dataset[i], cfg.distance_mode, kmax=cfg.kmax,
                    mesh=self.mesh))

    # -------------------------------------------------------- correspondence
    def match(self):
        """Find correspondence between multi-omics datasets
        (jamie/jamie.py:224-250)."""
        cfg = self.config
        print('Device:', jax.devices()[0].platform)
        cor_pairs = []
        for i in range(self.dataset_num):
            for j in range(i, self.dataset_num):
                if i == j:
                    continue
                print('-' * 33)
                print(f'Find correspondence between Dataset {i + 1} '
                      f'and Dataset {j + 1}')
                if getattr(self, '_use_landmarks', False):
                    from .solvers.landmark import landmark_correspondence
                    F = landmark_correspondence(
                        self.dataset[i], self.dataset[j],
                        n_landmarks=cfg.corr_landmarks or 2048,
                        k_interp=cfg.corr_landmark_k,
                        selection=cfg.corr_landmark_selection,
                        factor_layout=cfg.corr_factor_layout,
                        distance_mode=cfg.distance_mode, kmax=cfg.kmax,
                        seed=cfg.manual_seed, mesh=self.mesh,
                        epoch_pd=cfg.epoch_pd, rho=cfg.rho,
                        epsilon=cfg.epsilon, delay=cfg.delay,
                        log_pd=cfg.log_pd,
                        precision=('highest' if cfg.solver_dtype == 'float32'
                                   else 'default'),
                        # L x L solver state is tiny; 'auto' resolves f32
                        state_dtype=(cfg.solver_state_dtype
                                     if cfg.solver_state_dtype != 'auto'
                                     else 'float32'))
                elif cfg.corr_method == 'unioncom':
                    F = self.Prime_Dual(
                        [self.dist[i], self.dist[j]],
                        dx=self.col[i], dy=self.col[j])
                else:
                    warnings.warn(
                        'Correlation method `jamie` is currently a WIP, and '
                        'does not produce reliable results')
                    F = self.com_corr([self.dist[i], self.dist[j]])
                cor_pairs.append(F)
        print('Finished Matching!')
        return cor_pairs

    def _resolved_state_dtype(self, entries: int) -> str:
        """'auto' -> exact f32 state up to DENSE_F32_STATE_ENTRIES (the
        measured one-chip f32 ceiling is 441M at N=21k; 250M keeps margin
        for co-resident buffers), bf16 state in the band up to
        LANDMARK_AUTO_ENTRIES (bf16 measured PASS at 625M / N=25k;
        quality A/B'd seed-neutral on scGEM, examples/pd_state_bf16_ab.py +
        pd_dense_ceiling_probe.py, round 5)."""
        st = self.config.solver_state_dtype
        if st != 'auto':
            return st
        return ('float32' if entries <= DENSE_F32_STATE_ENTRIES
                else 'bfloat16')

    def Prime_Dual(self, dist, dx=None, dy=None, verbose=True):
        cfg = self.config
        entries = int(np.shape(dist[0])[0]) * int(np.shape(dist[1])[0])
        return prime_dual(
            dist[0], dist[1], dx=dx, dy=dy,
            epoch_pd=cfg.epoch_pd, rho=cfg.rho, epsilon=cfg.epsilon,
            delay=cfg.delay, log_pd=cfg.log_pd, verbose=verbose,
            precision=('highest' if cfg.solver_dtype == 'float32'
                       else 'default'),
            state_dtype=self._resolved_state_dtype(entries),
            mesh=self.mesh)

    def com_corr(self, dist):
        """Experimental low-rank correspondence (jamie/jamie.py:252-312).
        Kept for API parity; like the reference, warned unreliable."""
        from .solvers.lowrank import lowrank_corr
        return lowrank_corr(dist[0], dist[1])

    # ------------------------------------------------------------- training
    def project_jamie(self, W):
        """Train the coupled VAE and return integrated embeddings
        (jamie/jamie.py:416-804)."""
        cfg = self.config
        print('-' * 33)
        print('Train coupled autoencoders')
        assert len(W) == 2, 'Currently only compatible with 2 modalities.'

        from .ops.sparse import SparseRows, is_sparse_input
        if self.P is None:
            if self.row[0] == self.row[1]:
                # Past SENTINEL_ENTRIES, keep the identity implicit (atlas)
                if self.row[0] * self.row[1] > SENTINEL_ENTRIES:
                    self.P = 'identity'
                else:
                    self.P = np.eye(self.row[0], dtype=np.float32)
            elif self.row[0] * self.row[1] > SENTINEL_ENTRIES:
                # Unaligned atlas pair: dense all-zeros P at 120k x 100k is
                # ~45 GB host + HBM for nothing. A zero-nnz SparseRows flows
                # through the sparse path and selects the 'zeros' sampling
                # regime, which is what an all-zeros prior means.
                self.P = SparseRows.from_coo(
                    [], [], [], (self.row[0], self.row[1]))
            else:
                self.P = np.zeros((self.row[0], self.row[1]), np.float32)
        if not (isinstance(self.P, str) or is_sparse_input(self.P)):
            self.P = np.asarray(self.P, np.float32)
        from .ops.lowrank import LowRankF
        F_in = W[0][1]
        if (isinstance(F_in, (str, LowRankF)) or is_sparse_input(F_in)):
            self.F = F_in  # sentinel / sparse / low-rank: pass through
        elif hasattr(F_in, 'devices'):
            self.F = F_in  # solver output stays device-resident (no fetch)
        else:
            self.F = np.asarray(F_in, np.float32)
        if (cfg.f_top_k is not None and not isinstance(self.F, str)
                and not is_sparse_input(self.F) and np.ndim(self.F) == 2):
            # Correspondence mass concentrates on a few candidates per cell;
            # top-k compression bounds trainer memory at O(N k) (atlas path)
            self.F = SparseRows.top_k(self.F, cfg.f_top_k)

        # Preprocessing per modality (jamie.py:434-469)
        pca_dims = cfg.pca_dim if cfg.pca_dim is not None else (None, None)
        timer = TimeLogger(block=True)
        self.preprocessors = tuple(
            Preprocessor.fit(data, pca_dim=dim, method=cfg.model_pca,
                             power_iters=cfg.pca_power_iters)
            for dim, data in zip(pca_dims, self.dataset))
        # transform_fit reuses the cached PCA scores of the fit data — no
        # second full-matrix projection (jamie.py:468 re-transforms; at
        # 242k features that would re-stream 9 GB through HBM)
        transformed = [pre.transform_fit() for pre in self.preprocessors]
        # Wide-modality bf16 residencies (shared by the distance + PCA
        # phases) release their HBM before training claims it
        from .core.residency import clear_residency_cache
        clear_residency_cache()
        timer.log('Preprocessing')
        self.col = [int(x.shape[1]) for x in transformed]

        self.model = CoupledVAE(
            input_dim=tuple(self.col), output_dim=cfg.output_dim,
            dropout=cfg.dropout,
            compute_dtype=jnp.bfloat16 if cfg.compute_dtype == 'bfloat16'
            else jnp.float32,
            matmul_bf16=cfg.model_matmul_dtype == 'bfloat16')

        self.trainer = JamieTrainer(
            cfg, self.model, transformed, self.P, self.F, mesh=self.mesh)
        timer.log('Trainer setup')
        state = self.trainer.fit(
            checkpoint_dir=cfg.checkpoint_dir,
            checkpoint_every=cfg.checkpoint_every,
            metrics_path=cfg.metrics_path)
        timer.log('Training')
        self.params = state.params
        self.batch_stats = state.batch_stats
        self.train_state = state
        self.loss_history = self.trainer.loss_history
        self.epochs_run = self.trainer.epochs_run
        self.fit_seconds = self.trainer.fit_seconds
        self.sampling_method = self.trainer.sampling_method

        integrated_data = self.trainer.final_embed(state)
        timer.log('Output')
        print('Finished Mapping!')
        if cfg.debug:
            timer.aggregate()
        self._mapping_timings = timer.totals()
        return integrated_data

    # ------------------------------------------------------------ inference
    def _variables(self):
        assert self.model is not None, (
            'Model must be trained before modal prediction.')
        return {'params': self.params, 'batch_stats': self.batch_stats}

    def _jitted(self, name: str, fn):
        """Per-instance cache of jitted serving functions (the reference's
        'serve path', SURVEY.md section 3.2, runs as one compiled call)."""
        cache = self.__dict__.setdefault('_jit_cache', {})
        if name not in cache:
            cache[name] = jax.jit(fn)
        return cache[name]

    def modal_predict(self, data, modality: int, pre_transformed: bool = False):
        """Cross-modal imputation (jamie/jamie.py:806-815)."""
        assert self.model is not None, (
            'Model must be trained before modal prediction.')
        to_modality = (modality + 1) % self.dataset_num
        if not pre_transformed:
            data = self.preprocessors[modality].transform(data)
        impute = self._jitted(
            f'impute{modality}',
            lambda v, x: self.model.apply(
                v, x, modality, to_modality, train=False,
                method=CoupledVAE.impute))
        decoded = impute(self._variables(), jnp.asarray(data, jnp.float32))
        return np.asarray(
            self.preprocessors[to_modality].inverse_transform(
                np.asarray(decoded)))

    def transform(self, dataset, corr=None, pre_transformed: bool = False):
        """Re-embed both modalities with a trained model
        (jamie/jamie.py:817-829).

        The reference runs the full forward (materializing an N x N eye as
        corr — 40 GB at 100k cells) and returns output[0], the pre-combine
        latents. In eval mode those are exactly the mu heads (z = mu, no
        sampling) and do not depend on corr at all, so they are computed
        per modality directly — numerically identical, no N x N, and the
        decoders never run. `corr` is accepted for signature parity and
        ignored (it never influenced the returned value)."""
        assert self.model is not None, (
            'Model must be trained before transform.')
        del corr
        return [self.transform_one(dataset[i], i, pre_transformed)
                for i in range(len(dataset))]

    def transform_one(self, data, i: int, pre_transformed: bool = False):
        """Single-modality embedding via the mu head (jamie/jamie.py:831-837)."""
        assert self.model is not None, (
            'Model must be trained before transform.')
        if not pre_transformed:
            data = self.preprocessors[i].transform(data)
        embed = self._jitted(
            f'embed{i}',
            lambda v, x: self.model.apply(v, x, i, train=False,
                                          method=CoupledVAE.embed_one))
        return np.asarray(embed(self._variables(),
                                jnp.asarray(data, jnp.float32)))

    # -------------------------------------------------------------- metrics
    # One implementation lives in evaluation.py (device fast paths); these
    # are the reference's method-form API (jamie/jamie.py:892-941).
    def test_closer(self, integrated_data, distance_metric=None):
        """FOSCTTM, both directions (jamie/jamie.py:892-915)."""
        from .evaluation import test_closer
        return test_closer(integrated_data, distance_metric=distance_metric)

    def test_label_dist(self, integrated_data, datatype,
                        distance_metric=None, verbose=True):
        """Inter-label centroid distances (jamie/jamie.py:917-941)."""
        from .evaluation import test_label_dist
        return test_label_dist(integrated_data, datatype,
                               distance_metric=distance_metric,
                               verbose=verbose)

    def test_LabelTA(self, integrated_data, datatype, k=None,
                     return_k: bool = False):
        """Label-transfer accuracy via kNN (jamie/jamie.py:943-961)."""
        from .evaluation import knn_label_transfer_accuracy
        acc, k = knn_label_transfer_accuracy(integrated_data, datatype, k=k)
        if return_k:
            return acc, k
        return acc

    def Visualize(self, data, integrated_data, datatype=None, mode=None):
        """In-class API for the visualization function (jamie/jamie.py:963-965)."""
        from .utils import uc_visualize
        uc_visualize(data, integrated_data, datatype=datatype, mode=mode)

    # ---------------------------------------------------------- persistence
    def save_model(self, f):
        """Array-based checkpoint (replaces torch whole-module pickle,
        jamie/jamie.py:967-968)."""
        header = {
            'version': __version__,
            'input_dim': list(self.model.input_dim),
            'output_dim': self.model.output_dim,
            'dropout': self.model.dropout,
            'num_modalities': self.dataset_num,
            # Numerics flags: without them a reload serves f32 matmuls for
            # a model fitted (and validated) with bf16 ones
            'matmul_bf16': bool(getattr(self.model, 'matmul_bf16', False)),
            'compute_bf16': (getattr(self.model, 'compute_dtype', None)
                             == jnp.bfloat16),
        }
        save_checkpoint(f, self.params, self.batch_stats,
                        self.preprocessors, header)

    def load_model(self, f):
        """Restore a checkpoint (jamie/jamie.py:970-972)."""
        params, batch_stats, pres, header = load_checkpoint(f)
        self.params = params
        self.batch_stats = batch_stats
        self.preprocessors = pres
        self.dataset_num = int(header['num_modalities'])
        self.model = CoupledVAE(
            input_dim=tuple(header['input_dim']),
            output_dim=int(header['output_dim']),
            dropout=header['dropout'],
            compute_dtype=(jnp.bfloat16 if header.get('compute_bf16')
                           else jnp.float32),
            matmul_bf16=bool(header.get('matmul_bf16', False)))
        return self
