from ma_tpu.index.suffix_array import suffix_array
from ma_tpu.index.fmd_index import FMDIndex
