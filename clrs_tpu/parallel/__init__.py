"""Multi-chip mesh sharding for the IPM (see .api, .bigcluster)."""

from .api import (BLOCK_AXIS, enable_row_sharding, make_mesh,
                  multi_cluster_test_problem, shard_device_sdp, shard_state)

__all__ = ["BLOCK_AXIS", "enable_row_sharding", "make_mesh",
           "multi_cluster_test_problem", "shard_device_sdp", "shard_state"]
