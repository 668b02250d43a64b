"""Query planning: deliberately (almost) empty.

The reference has no query optimizer — its "plans" are hand-wired
actor topologies (SURVEY.md §4). In the rebuild every dataflow is
declared through the DataFrame API, so planning belongs to Catalyst,
and **zero custom rules or strategies are required**:

- predicate pushdown / column pruning / partition pruning: free from
  declarative plans (verified by tools/plan_audit.py — PushedFilters,
  pruned ReadSchema, PartitionFilters on the host-partitioned links
  scan);
- join strategy: dims broadcast, facts shuffle, AQE converts the
  expand join to broadcast at runtime and splits skewed partitions;
- codegen/vectorization: whole-stage codegen spans the column algebra;
  Python exists only behind Arrow batch boundaries.

The two genuinely custom pieces live ABOVE the planner as algorithms,
not rules (SURVEY §4 "Net"):

1. the wave formulation of partition-exclusive, politeness-bounded,
   BFS-ordered scheduling — operators/wave.py + crawl/engine.py;
2. the approximate-filter discipline (bloom/cuckoo/sharded bloom may
   only PASS candidates, the exact anti-join decides) — filters/.

Keeping this package empty is a statement of design, not an omission:
hand-scheduling what Catalyst already optimizes would make the engine
slower and unportable.
"""
