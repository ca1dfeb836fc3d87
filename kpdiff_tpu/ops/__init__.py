from kpdiff_tpu.ops.schedule import (
    cosine_beta_schedule,
    clip_noise_schedule,
    polynomial_schedule,
    NoiseSchedule,
    sigma_from_gamma,
    alpha_from_gamma,
    sigma_and_alpha_t_given_s,
)
from kpdiff_tpu.ops.geometry import (
    masked_mean,
    masked_com,
    pairwise_diff,
    pairwise_dist,
    rbf_embed,
    norm_no_nan,
)
from kpdiff_tpu.ops.neighbors import (
    dense_radius_adjacency,
    dense_knn_adjacency,
    knn_indices,
    radius_neighbor_list,
)
