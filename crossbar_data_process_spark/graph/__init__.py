"""Graph-analytics layer (BASELINE.json: "GraphX for analytics portion").

GraphFrames/GraphX bindings aren't available in this environment, so the
algorithms are implemented directly as iterative DataFrame programs — the
same Pregel-style message passing GraphX would run, expressed as joins that
Catalyst/AQE optimize. Each iteration is one hash-shuffle on the node id;
convergence is detected with a cheap aggregate.
"""

from crossbar_data_process_spark.graph.components import connected_components
from crossbar_data_process_spark.graph.hierarchy import transitive_closure
from crossbar_data_process_spark.graph.pagerank import pagerank

__all__ = ["connected_components", "pagerank", "transitive_closure"]
