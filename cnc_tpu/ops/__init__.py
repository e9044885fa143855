from .hash_ops import fast_hash, grid_index, grid_index_np
from .ste import ste_binary, ste_multistep, trunc_exp, quantize_embedding
from .sh import sh_encode, sine_embed
from .entropy import bernoulli_bits, global_pg_bits
from .sat import (build_sat, box_count, occupancy_mask, overlap_volume_cells,
                  overlap_area_pool_int, footprint_box)
from .encoding import (grid_encode, grid_encode_diff_levels,
                          grid_encode_given_table, encode_explicit)
from .scan import (segment_exclusive_sum, segment_inclusive_sum,
                   segment_exclusive_prod, segment_inclusive_prod, pack_info)
