"""PC-stable constraint-based structure learning + Meek rules.

Rebuild of reference learning/algorithms/pc.{hpp,cpp} and constraint.hpp:
skeleton discovery with sepset orders 0/1/≥2 (pc.cpp:33-263), v-structure
orientation with three policies — sepset-based, ambiguous-vote with
``ambiguous_threshold`` (default 0.5), optional bidirected arcs
(constraint.hpp:296-389) — and Meek rules 1-3 to fixpoint
(constraint.hpp:391-511).
"""

from __future__ import annotations

import itertools

from ...graph import ConditionalPartiallyDirectedGraph, PartiallyDirectedGraph
from ...utils import Combinations2Sets

__all__ = ["PC", "MeekRules", "SepSet"]


class SepSet:
    """Separating sets discovered during skeleton search
    (reference constraint.hpp SepSet)."""

    def __init__(self):
        self._map = {}

    def insert(self, edge, sepset, pvalue) -> None:
        self._map[frozenset(edge)] = (set(sepset), pvalue)

    def sepset(self, edge):
        key = frozenset(edge)
        if key not in self._map:
            raise KeyError(f"Edge {tuple(edge)} not found in sepset")
        return self._map[key]

    def __contains__(self, edge) -> bool:
        return frozenset(edge) in self._map


# ============================================================== Meek rules
class MeekRules:
    """(reference constraint.hpp:391-511)."""

    @staticmethod
    def rule1(pdag) -> bool:
        """a -> b — c  with a not adjacent to c  ⇒  b -> c."""

        def find_new(to_check):
            new_arcs = []
            for (a, b) in to_check:
                for c in pdag.neighbors(b):
                    if not pdag.has_connection(a, c):
                        new_arcs.append((b, c))
            return new_arcs

        new_arcs = find_new(pdag.arcs())
        for (s, t) in new_arcs:
            pdag.direct(s, t)
        changed = bool(new_arcs)
        to_check = new_arcs
        while to_check:
            new_arcs = find_new(to_check)
            for (s, t) in new_arcs:
                pdag.direct(s, t)
            to_check = new_arcs
        return changed

    @staticmethod
    def rule2(pdag) -> bool:
        """a — b with a directed path a -> c -> b  ⇒  a -> b."""
        new_arcs = []
        for (u, v) in pdag.edges():
            children_u = set(pdag.children(u))
            parents_v = set(pdag.parents(v))
            if children_u & parents_v:
                new_arcs.append((u, v))
                continue
            parents_u = set(pdag.parents(u))
            children_v = set(pdag.children(v))
            if parents_u & children_v:
                new_arcs.append((v, u))
        for (s, t) in new_arcs:
            pdag.direct(s, t)
        return bool(new_arcs)

    @staticmethod
    def rule3(pdag) -> bool:
        """b — a, b — c1, b — c2, c1 -> a, c2 -> a, c1 /~ c2  ⇒  b -> a."""
        changed = False
        for a in list(pdag.nodes()):
            parents = set(pdag.parents(a))
            nbr = pdag.neighbors(a)
            if len(parents) < 2 or not nbr:
                continue
            new_arcs = []
            for b in nbr:
                inter = set(pdag.neighbors(b)) & parents
                if len(inter) >= 2:
                    for c1, c2 in itertools.combinations(sorted(inter), 2):
                        if not pdag.has_connection(c1, c2):
                            new_arcs.append((b, a))
            for (s, t) in new_arcs:
                pdag.direct(s, t)
            changed |= bool(new_arcs)
        return changed

    @staticmethod
    def all_rules_sequential_interactive(pdag) -> None:
        changed = True
        while changed:
            changed = False
            changed |= MeekRules.rule1(pdag)
            changed |= MeekRules.rule2(pdag)
            changed |= MeekRules.rule3(pdag)


# =========================================================== skeleton search
def _adjacent_pool(g, node, exclude=None):
    pool = set(g.neighbors(node)) | set(g.parents(node))
    pool.discard(node)
    if exclude is not None:
        pool.discard(exclude)
    return pool


def _find_skeleton(g, test, alpha, edge_whitelist, sepset: SepSet):
    """(reference pc.cpp:222-263)."""
    wl = {frozenset(e) for e in edge_whitelist}

    # order 0 (pc.cpp:33-90)
    for (u, v) in list(g.edges()):
        if frozenset((u, v)) in wl:
            continue
        pvalue = test.pvalue(u, v)
        if pvalue > alpha:
            g.remove_edge(u, v)
            sepset.insert((u, v), set(), pvalue)

    def max_cardinality(limit):
        return all(
            len(_adjacent_pool(g, n)) <= limit for n in g.nodes()
        )

    if g.num_edges() == len(wl) or max_cardinality(1):
        return sepset

    # order 1 (pc.cpp:92-144)
    to_remove = []
    for (u, v) in g.edges():
        if frozenset((u, v)) in wl:
            continue
        pool = (_adjacent_pool(g, u) | _adjacent_pool(g, v)) - {u, v}
        for cond in pool:
            pvalue = test.pvalue(u, v, cond)
            if pvalue > alpha:
                to_remove.append((u, v))
                sepset.insert((u, v), {cond}, pvalue)
                break
    for (u, v) in to_remove:
        g.remove_edge(u, v)

    # order >= 2 (pc.cpp:148-263)
    limit = 2
    while g.num_edges() > len(wl) and not max_cardinality(limit):
        to_remove = []
        for (u, v) in g.edges():
            if frozenset((u, v)) in wl:
                continue
            result = _find_multivariate_sepset(g, (u, v), limit, test, alpha)
            if result is not None:
                to_remove.append((u, v))
                sepset.insert((u, v), result[0], result[1])
        for (u, v) in to_remove:
            g.remove_edge(u, v)
        limit += 1
    return sepset


def _find_multivariate_sepset(g, edge, sep_size, test, alpha):
    u, v = edge
    # validity is checked against the FULL neighbourhood (including the other
    # endpoint), the candidate list excludes it (reference pc.cpp:169-186)
    set1_valid = len(_adjacent_pool(g, u)) > sep_size
    set2_valid = len(_adjacent_pool(g, v)) > sep_size
    pool1 = _adjacent_pool(g, u, exclude=v)
    pool2 = _adjacent_pool(g, v, exclude=u)
    if not set1_valid and not set2_valid:
        return None
    if set1_valid and set2_valid:
        comb = Combinations2Sets(sorted(pool1), sorted(pool2), sep_size)
    elif set1_valid:
        comb = itertools.combinations(sorted(pool1), sep_size)
    else:
        comb = itertools.combinations(sorted(pool2), sep_size)
    for s in comb:
        pvalue = test.pvalue(u, v, *s)
        if pvalue > alpha:
            return set(s), pvalue
    return None


# ============================================================= v-structures
def _is_unambiguous_vstructure(g, p1, p2, child, test, alpha,
                               ambiguous_threshold):
    """(reference constraint.hpp is_unambiguous_vstructure)."""
    pool1 = _adjacent_pool(g, p1)
    pool2 = _adjacent_pool(g, p2)
    max_sepset = max(len(pool1), len(pool2))

    indep_sepsets = 0
    children_in_sepsets = 0
    if test.pvalue(p1, p2) > alpha:
        indep_sepsets += 1

    # univariate candidates (constraint.hpp count_univariate_sepsets)
    if test.pvalue(p1, p2, child) > alpha:
        indep_sepsets += 1
        children_in_sepsets += 1
    possible = (pool1 | pool2) - {child, p1, p2}
    for sp in possible:
        if test.pvalue(p1, p2, sp) > alpha:
            indep_sepsets += 1

    if ambiguous_threshold == 0 and children_in_sepsets > 0:
        return False

    if max_sepset >= 2:
        u1 = sorted(pool1) if len(pool1) >= 2 else []
        u2 = sorted(pool2) if len(pool2) >= 2 else []
        for size in range(2, max_sepset + 1):
            s1 = len(u1) >= size
            s2 = len(u2) >= size
            if s1 and s2:
                comb = Combinations2Sets(u1, u2, size)
            elif s1:
                comb = itertools.combinations(u1, size)
            elif s2:
                comb = itertools.combinations(u2, size)
            else:
                continue
            for s in comb:
                if test.pvalue(p1, p2, *s) > alpha:
                    indep_sepsets += 1
                    if child in s:
                        children_in_sepsets += 1
            if ambiguous_threshold == 0 and children_in_sepsets > 0:
                return False

    if indep_sepsets > 0:
        ratio = children_in_sepsets / indep_sepsets
        return ratio < ambiguous_threshold or ratio == 0
    return False


def _is_vstructure(g, p1, p2, child, test, alpha, sepset, use_sepsets,
                   ambiguous_threshold):
    if g.has_connection(p1, p2):
        return False
    if use_sepsets and sepset is not None and (p1, p2) in sepset:
        s, _ = sepset.sepset((p1, p2))
        return child not in s
    if use_sepsets:
        return _is_unambiguous_vstructure(g, p1, p2, child, test, alpha, 0)
    return _is_unambiguous_vstructure(
        g, p1, p2, child, test, alpha, ambiguous_threshold
    )


def _direct_unshielded_triples(g, test, arc_blacklist, arc_whitelist, alpha,
                               sepset, use_sepsets, ambiguous_threshold,
                               allow_bidirected):
    """(reference constraint.hpp:296-353)."""
    vs = []
    for node in g.nodes():
        nbr = g.neighbors(node)
        parents = g.parents(node)
        if len(nbr) < 1 or len(nbr) + len(parents) < 2:
            continue
        found_here = []
        for p1, p2 in itertools.combinations(sorted(nbr), 2):
            if _is_vstructure(g, p1, p2, node, test, alpha, sepset,
                              use_sepsets, ambiguous_threshold):
                found_here.append((p1, p2, node))
        used = {p for (p1, p2, _) in found_here for p in (p1, p2)}
        remaining = [n for n in nbr if n not in used]
        for neighbor in remaining:
            for parent in parents:
                if _is_vstructure(g, neighbor, parent, node, test, alpha,
                                  sepset, use_sepsets, ambiguous_threshold):
                    found_here.append((neighbor, parent, node))
        vs.extend(found_here)

    bl = set(arc_blacklist)
    wlset = set(arc_whitelist)
    for (p1, p2, child) in vs:
        if (p1, child) in bl or (p2, child) in bl:
            continue
        if not allow_bidirected:
            if (
                g.has_arc(child, p1) and (child, p1) in wlset
            ) or (g.has_arc(child, p2) and (child, p2) in wlset):
                continue
        g.direct(p1, child)
        g.direct(p2, child)
        if not allow_bidirected:
            if g.has_arc(child, p1):
                g.remove_arc(child, p1)
            if g.has_arc(child, p2):
                g.remove_arc(child, p2)


# ===================================================================== PC
class PC:
    """(reference pc.hpp:13, pc.cpp:340-428)."""

    def estimate(
        self,
        hypot_test,
        nodes=None,
        arc_blacklist=None,
        arc_whitelist=None,
        edge_blacklist=None,
        edge_whitelist=None,
        alpha: float = 0.05,
        use_sepsets: bool = False,
        ambiguous_threshold: float = 0.5,
        allow_bidirected: bool = True,
        verbose: int = 0,
    ) -> PartiallyDirectedGraph:
        if nodes is None:
            nodes = hypot_test.variable_names()
        if not hypot_test.has_variables(nodes):
            raise ValueError("Test does not contain all the variables")
        skeleton = PartiallyDirectedGraph.CompleteUndirected(nodes)
        return self._estimate_impl(
            skeleton, hypot_test, arc_blacklist, arc_whitelist,
            edge_blacklist, edge_whitelist, alpha, use_sepsets,
            ambiguous_threshold, allow_bidirected,
        )

    def estimate_conditional(
        self,
        hypot_test,
        nodes,
        interface_nodes=None,
        arc_blacklist=None,
        arc_whitelist=None,
        edge_blacklist=None,
        edge_whitelist=None,
        alpha: float = 0.05,
        use_sepsets: bool = False,
        ambiguous_threshold: float = 0.5,
        allow_bidirected: bool = True,
        verbose: int = 0,
    ) -> ConditionalPartiallyDirectedGraph:
        interface_nodes = list(interface_nodes or [])
        if not interface_nodes:
            return self.estimate(
                hypot_test, nodes, arc_blacklist, arc_whitelist,
                edge_blacklist, edge_whitelist, alpha, use_sepsets,
                ambiguous_threshold, allow_bidirected, verbose,
            )
        skeleton = ConditionalPartiallyDirectedGraph(nodes, interface_nodes)
        # complete: node-node + node-interface edges
        names = list(nodes)
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                skeleton.add_edge(names[i], names[j])
            for itf in interface_nodes:
                skeleton.add_edge(names[i], itf)
        return self._estimate_impl(
            skeleton, hypot_test, arc_blacklist, arc_whitelist,
            edge_blacklist, edge_whitelist, alpha, use_sepsets,
            ambiguous_threshold, allow_bidirected,
        )

    def _estimate_impl(self, skeleton, test, arc_blacklist, arc_whitelist,
                       edge_blacklist, edge_whitelist, alpha, use_sepsets,
                       ambiguous_threshold, allow_bidirected):
        from ...utils.validate import validate_restrictions

        # normalize + cross-check the lists (reference pc.cpp:277-278):
        # both-direction arc blacklists become edge removals, conflicting
        # white/blacklists raise.
        r = validate_restrictions(
            skeleton, arc_blacklist, arc_whitelist, edge_blacklist,
            edge_whitelist,
        )

        for e in r.edge_blacklist:
            u, v = tuple(e)
            if skeleton.has_edge(u, v):
                skeleton.remove_edge(u, v)
        for (s, t) in r.arc_whitelist:
            skeleton.direct(s, t)
        # a cycle cannot be generated with fewer arcs (pc.cpp:288-297)
        if len(r.arc_whitelist) > 2:
            try:
                skeleton.to_dag()
            except ValueError:
                raise ValueError(
                    "The selected blacklist/whitelist configuration does "
                    "not allow an acyclic graph."
                )

        sepset = SepSet()
        _find_skeleton(skeleton, test, alpha, r.edge_whitelist, sepset)

        if hasattr(skeleton, "is_interface"):
            # conditional graphs: interface edges become interface -> node
            # arcs, then blacklisted interface arcs are dropped
            # (pc.cpp:302-305, constraint.hpp remove_interface_arcs_blacklist)
            for (u, v) in list(skeleton.edges()):
                if skeleton.is_interface(u):
                    skeleton.direct(u, v)
                elif skeleton.is_interface(v):
                    skeleton.direct(v, u)
            for (s, t) in r.arc_blacklist:
                if skeleton.has_arc(s, t):
                    skeleton.remove_arc(s, t)

        # blacklisted arcs: direct the other way if an edge remains
        # (constraint.hpp direct_arc_blacklist)
        for (s, t) in r.arc_blacklist:
            if skeleton.has_edge(s, t):
                skeleton.direct(t, s)

        _direct_unshielded_triples(
            skeleton, test, r.arc_blacklist, r.arc_whitelist, alpha, sepset,
            use_sepsets, ambiguous_threshold, allow_bidirected,
        )
        MeekRules.all_rules_sequential_interactive(skeleton)
        return skeleton
