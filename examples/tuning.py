"""Loss-weight tuning via random search (reference: scMNC-Visual-Tuning.ipynb
driving utilities.tune_cm, jamie/utilities.py:485-503)."""

import numpy as np

from sample import make_branching_pair


def main():
    from jamie_tpu import JAMIE
    from jamie_tpu.utils import tune_cm

    dataset, types = make_branching_pair(n=200)
    types = [np.unique(t, return_inverse=True)[1] for t in types]
    jm = JAMIE(epoch_DNN=800, min_epochs=200, epoch_pd=300, batch_size=64,
               pca_dim=(32, 32), use_early_stop=False, log_DNN=100000)
    best_wt, best_data = tune_cm(jm, dataset, types, wt_size=4, num_search=5)
    print('best weights:', best_wt)


if __name__ == '__main__':
    main()
