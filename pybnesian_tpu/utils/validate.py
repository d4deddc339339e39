"""Arc/edge restriction validation (reference util/validate_whitelists.
{hpp,cpp}, ~300 LoC): cross-checks black/whitelists against each other and
the graph, producing a consistent restriction set."""

from __future__ import annotations

import dataclasses

__all__ = ["ListRestrictions", "validate_restrictions"]


@dataclasses.dataclass
class ListRestrictions:
    arc_blacklist: set
    arc_whitelist: set
    edge_blacklist: set
    edge_whitelist: set


def validate_restrictions(graph, arc_blacklist=None, arc_whitelist=None,
                          edge_blacklist=None, edge_whitelist=None) -> ListRestrictions:
    """Checks (reference validate_whitelists.cpp):

    - every restricted node exists in the graph;
    - an arc cannot be both black- and whitelisted;
    - both directions whitelisted → treated as a whitelisted edge;
    - a whitelisted edge cannot be blacklisted.
    """
    arc_blacklist = {tuple(a) for a in (arc_blacklist or [])}
    arc_whitelist = {tuple(a) for a in (arc_whitelist or [])}
    edge_blacklist = {frozenset(e) for e in (edge_blacklist or [])}
    edge_whitelist = {frozenset(e) for e in (edge_whitelist or [])}

    for (s, t) in list(arc_blacklist | arc_whitelist):
        for n in (s, t):
            if not graph.contains_node(n):
                raise ValueError(f"Node '{n}' in arc restriction not present "
                                 "in the graph")
        if s == t:
            raise ValueError(f"Self-loop restriction ({s}, {t}) is invalid")
    for e in list(edge_blacklist | edge_whitelist):
        for n in e:
            if not graph.contains_node(n):
                raise ValueError(f"Node '{n}' in edge restriction not present "
                                 "in the graph")

    # both directions whitelisted -> whitelisted edge
    promote = {
        (s, t) for (s, t) in arc_whitelist if (t, s) in arc_whitelist
    }
    for (s, t) in promote:
        arc_whitelist.discard((s, t))
        arc_whitelist.discard((t, s))
        edge_whitelist.add(frozenset((s, t)))

    for (s, t) in arc_whitelist:
        if (s, t) in arc_blacklist:
            raise ValueError(
                f"Arc ({s}, {t}) is both blacklisted and whitelisted"
            )
        if frozenset((s, t)) in edge_blacklist:
            raise ValueError(
                f"Arc ({s}, {t}) is whitelisted but the edge is blacklisted"
            )
    for e in edge_whitelist:
        if e in edge_blacklist:
            raise ValueError(
                f"Edge {tuple(e)} is both blacklisted and whitelisted"
            )

    return ListRestrictions(
        arc_blacklist, arc_whitelist, edge_blacklist, edge_whitelist
    )
