from .distances import (
    pairwise_distance, pairwise_sq_euclidean, dataset_distance_matrix,
    geodesic_distances,
)

__all__ = [
    'pairwise_distance', 'pairwise_sq_euclidean', 'dataset_distance_matrix',
    'geodesic_distances',
]
