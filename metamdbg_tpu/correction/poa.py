"""Quality-weighted minimizer DAG consensus for read correction.

Mirrors the ReadCorrection Graph/Node/Edge classes and the greedy
heaviest-path walk (src/readSelection/ReadCorrection.hpp:640-1461 Graph,
5151-5581 performPoaCorrection4, 5730-5980 computePath2 +
computeSuccessorCompletion, 5983-6096 trimCorrectedPath):

- the reference read's minimizers seed a backbone chain (node index = read
  position), edge weight = min(qual_i, qual_i+1);
- each aligned query read walks its edit transcript through the graph,
  bumping abundances/qualities and adding insertion/mismatch branch nodes
  (addNode2 reuses an existing successor with the same minimizer);
- consensus = greedy walk from the source with the best "completion" score,
  choosing among successors within 0.75x of the max edge weight by a BFS
  completion score (sum of downstream edge weights whose head minimizer
  occurs in the reference read);
- the path is trimmed to the first..last minimizer that overlap-aligns back
  to the original read.
"""

import numpy as np

from ..utils.stdmap import sequential_iteration_order
from . import aligner


class Node:
    __slots__ = ("index", "minimizer", "successors", "predecessors",
                 "abundance", "quality", "max_quality")

    def __init__(self, index, minimizer):
        self.index = index
        self.minimizer = minimizer
        self.successors = []     # list[Edge]
        self.predecessors = []   # list[Edge]
        self.abundance = 0
        self.quality = 0
        self.max_quality = 0

    def add_quality(self, q):
        self.quality += int(q)
        self.max_quality = max(self.max_quality, int(q))


class Edge:
    __slots__ = ("tail", "head", "weight", "support")

    def __init__(self, tail, head, weight):
        self.tail = tail
        self.head = head
        self.weight = int(weight)
        self.support = 1


class PoaGraph:
    """ReadCorrection::Graph (ReadCorrection.hpp:640-691)."""

    def __init__(self, minimizers, qualities):
        self.nodes = []
        for i in range(len(minimizers)):
            node = Node(i, int(minimizers[i]))
            node.abundance += 1
            node.add_quality(qualities[i])
            self.nodes.append(node)
        for i in range(len(minimizers) - 1):
            qual = min(int(qualities[i]), int(qualities[i + 1]))
            self._add_edge(self.nodes[i], self.nodes[i + 1], qual)

    def _add_edge(self, tail, head, weight):
        """addEdge2 semantics (hpp:1375-1400): merge into existing edge."""
        if tail is None:
            return
        for edge in tail.successors:
            if edge.head is head:
                edge.weight += int(weight)
                edge.support += 1
                return
        edge = Edge(tail, head, weight)
        tail.successors.append(edge)
        head.predecessors.append(edge)

    def _add_node2(self, prev_node, minimizer):
        """addNode2 (hpp:1343-1372): reuse prev's successor with the same
        minimizer, else create."""
        if prev_node is not None:
            for edge in prev_node.successors:
                if edge.head.minimizer == minimizer:
                    return edge.head
        node = Node(len(self.nodes), minimizer)
        self.nodes.append(node)
        return node

    def add_alignment(self, alignments, ref_mins, q_mins, q_quals):
        """addAlignment2 (hpp:1179-1271)."""
        prev_node = None
        for (rpos, qpos) in alignments:
            if rpos == -1:  # insertion
                cur = self._add_node2(prev_node, int(q_mins[qpos]))
                cur.abundance += 1
                cur.add_quality(q_quals[qpos])
                if prev_node is not None:
                    self._add_edge(prev_node, cur, q_quals[qpos])
                prev_node = cur
            elif qpos == -1:  # deletion: skipped entirely
                pass
            elif int(ref_mins[rpos]) == int(q_mins[qpos]):  # match
                cur = self.nodes[rpos]
                cur.abundance += 1
                cur.add_quality(q_quals[qpos])
                if prev_node is not None:
                    self._add_edge(prev_node, cur, q_quals[qpos])
                prev_node = cur
            else:  # mismatch: branch node
                cur = self._add_node2(prev_node, int(q_mins[qpos]))
                cur.abundance += 1
                cur.add_quality(q_quals[qpos])
                if prev_node is not None:
                    self._add_edge(prev_node, cur, q_quals[qpos])
                prev_node = cur


def successor_completion(edge, ref_minimizer_set):
    """computeSuccessorCompletion (hpp:5948-5980): BFS sum of downstream
    edge weights whose head minimizer occurs in the reference read."""
    completion = edge.weight
    queue = [edge.head]
    head = 0
    visited = set()
    while head < len(queue):
        node = queue[head]
        head += 1
        if id(node) in visited:
            continue
        visited.add(id(node))
        for nn in node.successors:
            if nn.head.minimizer in ref_minimizer_set:
                completion += nn.weight
            queue.append(nn.head)
    return completion


class _CompletionTable:
    """Whole-graph successor-completion table.

    successor_completion's per-edge BFS revisits nearly the whole graph for
    every candidate edge (dominant ONT-correction cost: 370M list appends
    at 86 Mbp). Edge weights are ints, so the BFS sum is order-free and
    equals: edge.weight + sum of contrib(v) over v reachable from
    edge.head, where contrib(v) = sum of v's out-edge weights whose head
    minimizer is in the reference set. On the (acyclic) POA graph that is
    one reverse-topological bitset closure + one integer matmul for every
    node at once; a detected cycle falls back to the exact per-edge BFS.
    """

    def __init__(self, graph, ref_minimizer_set):
        self.fallback = False
        nodes = []
        index = {}

        def visit(n):
            key = id(n)
            if key not in index:
                index[key] = len(nodes)
                nodes.append(n)

        for n in graph.nodes:
            visit(n)
        qi = 0
        while qi < len(nodes):
            for e in nodes[qi].successors:
                visit(e.head)
            qi += 1
        n_nodes = len(nodes)
        self.index = index
        if n_nodes == 0:
            self.S = np.zeros(0, np.int64)
            return

        contrib = np.zeros(n_nodes, np.int64)
        heads_of = [[] for _ in range(n_nodes)]
        indeg = np.zeros(n_nodes, np.int64)
        for i, n in enumerate(nodes):
            for e in n.successors:
                h = index[id(e.head)]
                heads_of[i].append(h)
                indeg[h] += 1
                if int(e.head.minimizer) in ref_minimizer_set:
                    contrib[i] += int(e.weight)

        # Kahn topological order; incomplete -> cycle -> exact BFS fallback
        topo = [int(x) for x in np.flatnonzero(indeg == 0)]
        qi = 0
        indeg = indeg.copy()
        while qi < len(topo):
            v = topo[qi]
            qi += 1
            for h in heads_of[v]:
                indeg[h] -= 1
                if indeg[h] == 0:
                    topo.append(h)
        if len(topo) < n_nodes:
            self.fallback = True
            return

        w_words = (n_nodes + 63) // 64
        masks = np.zeros((n_nodes, w_words), np.uint64)
        ar = np.arange(n_nodes)
        masks[ar, ar // 64] = np.uint64(1) << np.uint64(ar % 64)
        for v in reversed(topo):
            row = masks[v]
            for h in heads_of[v]:
                np.bitwise_or(row, masks[h], out=row)
        bools = np.unpackbits(masks.view(np.uint8), axis=1,
                              bitorder="little")[:, :n_nodes]
        self.S = bools.astype(np.int64) @ contrib

    def completion(self, edge, ref_minimizer_set):
        if self.fallback:
            return successor_completion(edge, ref_minimizer_set)
        return int(edge.weight) + int(self.S[self.index[id(edge.head)]])


def compute_path(graph: PoaGraph, ref_minimizer_set):
    """computePath2 greedy walk (hpp:5730-5928). Returns (mins, max_quals)
    or None when no source qualifies (caller falls back to the input read)."""
    table = _CompletionTable(graph, ref_minimizer_set)
    start = None
    max_completion = 0
    # the reference scans unordered_map<u32, Node*>; completion ties keep the
    # first-iterated source, so replicate libstdc++'s iteration order exactly
    for idx in sequential_iteration_order(len(graph.nodes)):
        node = graph.nodes[idx]
        if node.predecessors:
            continue
        for edge in node.successors:
            completion = table.completion(edge, ref_minimizer_set)
            if completion > max_completion:
                max_completion = completion
                start = node
    if start is None:
        return None

    visited = {id(start)}
    path = [start.minimizer]
    quals = [start.max_quality]
    current = start
    while True:
        max_weight = 0
        for edge in current.successors:
            if edge.head is current:
                continue
            if edge.weight > max_weight:
                max_weight = edge.weight
        min_weight = np.float32(max_weight * 0.75)

        solid = [e for e in current.successors
                 if e.head is not current
                 and np.float32(e.weight) >= min_weight]
        if not solid:
            break
        if len(solid) == 1:
            best = solid[0]
        else:
            best = None
            best_completion = 0
            for e in solid:
                completion = table.completion(e, ref_minimizer_set)
                if completion > best_completion:
                    best_completion = completion
                    best = e
            if best is None:
                break
        current = best.head
        if id(current) in visited:
            break
        visited.add(id(current))
        path.append(current.minimizer)
        quals.append(current.max_quality)
    return path, quals


def trim_corrected_path(original_mins, corrected_mins, corrected_quals):
    """trimCorrectedPath (hpp:5983-6096): OV-align corrected vs original,
    keep [first match, last match+1). Returns (mins, quals) (possibly empty).
    """
    alignment = aligner.perform_alignment(corrected_mins, original_mins)
    start = -1
    end = -1
    for (v1, v2) in alignment:
        if v1 == -1 or v2 == -1:
            continue
        if int(corrected_mins[v1]) == int(original_mins[v2]):
            if start == -1:
                start = v1
            end = v1 + 1
    if start == -1 or start == end:
        return [], []
    return corrected_mins[start:end], corrected_quals[start:end]
