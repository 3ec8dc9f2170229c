"""libstdc++ std::unordered_map iteration-order model.

The reference's POA consensus scans `unordered_map<u_int32_t, Node*> _nodes`
(src/readSelection/ReadCorrection.hpp:645, 5742) to pick the walk's start
node; completion ties are broken by *iteration order*, so byte parity of
read_data_corrected.txt requires reproducing libstdc++'s hashtable order.

Model (validated against a compiled g++ probe in tests/test_stdmap.py):
- identity hash for integral keys, bucket = key % bucket_count;
- a global singly-linked list; inserting into an empty bucket pushes the
  node at the global head (and re-points the old head's bucket), inserting
  into a non-empty bucket pushes at that bucket's segment head;
- rehash (growth ladder 1->13->29->59->127->257->541->1109->2357->5087->...,
  observed from _Prime_rehash_policy with max_load_factor 1) re-threads the
  existing list in order with the same head-insert rule;
- iteration follows the global list.
"""

BUCKET_GROWTH = [13, 29, 59, 127, 257, 541, 1109, 2357, 5087, 10273, 20753,
                 42043, 85229, 172933, 351061, 712697, 1447153, 2938679,
                 5967347, 11997103, 24123617, 48506147, 97459351, 195881809]

_BEFORE = -1  # sentinel node id


class UnorderedMapOrder:
    """Insertion simulator; iteration_order() returns keys in std iteration
    order. Supports unique integral keys, no erase (the reference's usage)."""

    def __init__(self):
        self.bucket_count = 1
        self.next_resize = 0         # _M_next_resize: 0 forces 1->13 upfront
        self.nxt = {_BEFORE: None}   # node id -> next node id
        self.buckets = {}            # bucket -> node id BEFORE segment head
        self.count = 0

    def _growth(self):
        for b in BUCKET_GROWTH:
            if b > self.bucket_count:
                return b
        raise OverflowError("bucket growth table exhausted")

    def insert(self, key: int):
        if self.count + 1 > self.next_resize:
            self._rehash(self._growth())
            self.next_resize = self.bucket_count
        self._insert_no_rehash(key)
        self.count += 1

    def _insert_no_rehash(self, key: int):
        bkt = key % self.bucket_count
        before = self.buckets.get(bkt)
        if before is not None:
            self.nxt[key] = self.nxt[before]
            self.nxt[before] = key
        else:
            old_head = self.nxt[_BEFORE]
            self.nxt[key] = old_head
            self.nxt[_BEFORE] = key
            self.buckets[bkt] = _BEFORE
            if old_head is not None:
                self.buckets[old_head % self.bucket_count] = key

    def _rehash(self, new_count: int):
        order = self.iteration_order()
        self.bucket_count = new_count
        self.nxt = {_BEFORE: None}
        self.buckets = {}
        for key in order:
            self._insert_no_rehash(key)

    def iteration_order(self):
        out = []
        node = self.nxt[_BEFORE]
        while node is not None:
            out.append(node)
            node = self.nxt[node]
        return out


def sequential_iteration_order(n: int):
    """Iteration order after inserting keys 0..n-1 in order (the POA graph's
    node-index pattern)."""
    m = UnorderedMapOrder()
    for k in range(n):
        m.insert(k)
    return m.iteration_order()
