from .core import (
    ConditionalDag,
    ConditionalDirectedGraph,
    ConditionalPartiallyDirectedGraph,
    ConditionalUndirectedGraph,
    Dag,
    DirectedGraph,
    PartiallyDirectedGraph,
    UndirectedGraph,
)

__all__ = [
    "DirectedGraph",
    "UndirectedGraph",
    "PartiallyDirectedGraph",
    "Dag",
    "ConditionalDirectedGraph",
    "ConditionalUndirectedGraph",
    "ConditionalPartiallyDirectedGraph",
    "ConditionalDag",
]
