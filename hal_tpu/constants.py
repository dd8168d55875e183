"""Shared constants.

NULL_INDEX mirrors the reference's hal_index_t NULL_INDEX = -1
(/root/reference/api/inc/halDefs.h).  HAL_VERSION mirrors the format version
string written into the file ("2.3", /root/reference/README.md:4).
"""

NULL_INDEX = -1
HAL_VERSION = "2.3"

# Storage format tags
FORMAT_HDF5 = "hdf5"
FORMAT_HALZ = "halz"  # hal_tpu's native columnar shard format
FORMAT_MMAP = "mmap"
