from tensornetworkforml_tpu.ops.embedding import psi_embed, psi_embed_pair
from tensornetworkforml_tpu.ops.contractions import (
    site_mats,
    boundary_vector,
    left_env_stack,
    right_env_stack,
    left_env_stack_fused,
    right_env_stack_fused,
    left_env_stack_parallel,
    right_env_stack_parallel,
    left_env_final,
    right_env_final,
    left_env_final_fused,
    right_env_final_fused,
    chain_scores,
    transfer_suffix_stack,
    transfer_append,
    env_apply_site,
)
from tensornetworkforml_tpu.ops.svd import truncated_svd_split

__all__ = [
    "psi_embed",
    "psi_embed_pair",
    "site_mats",
    "boundary_vector",
    "left_env_stack",
    "right_env_stack",
    "left_env_final",
    "right_env_final",
    "chain_scores",
    "transfer_suffix_stack",
    "transfer_append",
    "env_apply_site",
    "truncated_svd_split",
]
