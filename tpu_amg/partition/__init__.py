"""Graph partitioning for aggregation-based coarsening.

Host-side setup algorithms (reference src/partitioners/*): the Partition
node↔aggregate map, strength-of-connection graphs, and the
modularity-maximizing greedy partitioner.
"""

from tpu_amg.partition.partition import Partition, PartitionStats
from tpu_amg.partition.strength import strength_graph, Graph
from tpu_amg.partition.modularity import (
    ModularityPartitioner,
    PartitionerConfig,
    build_partition,
)
from tpu_amg.partition.multilevel import MultilevelPartitionerConfig

__all__ = [
    "Partition",
    "PartitionStats",
    "strength_graph",
    "Graph",
    "ModularityPartitioner",
    "PartitionerConfig",
    "build_partition",
    "MultilevelPartitionerConfig",
]
