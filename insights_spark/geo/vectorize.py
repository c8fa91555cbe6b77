"""Raster→vector: slippy-tile rasters back to lon/lat vector geometry.

The other half of the north rule's "raster↔vector" pair (SURVEY §2.11):
``geo/tiles.py`` rasterizes points into z/x/y density tiles; this module
turns tile rasters back into vector form —

* :func:`vectorize_tiles` — per-tile lon/lat quad polygons via the inverse
  web-mercator transform (pure column math, whole-stage-codegen'd, and
  reproducible in ANSI SQL: ``sinh`` is written in exp-form because the
  DuckDB oracle lacks ``sinh``; bounds rounded to 9 decimals on BOTH sides
  so the comparison is libm-ulp-proof).
* :func:`quad_wkt` — WKT polygon text for export (not oracle-compared:
  float→string formatting differs across engines).
* :func:`tile_regions` — merged hot-tile REGIONS: connected components
  over 4-adjacency, Pregel-style min-label propagation. The oracle is a
  DuckDB recursive-CTE transitive closure over the same adjacency.

No reference counterpart (the reference leaves rendering to
Postgres/Leaflet dashboards, e.g. underpass-ui queries in
advanced-queries.md); formulas are the public OSM slippy-map spec.

Scale posture: a tile raster is bounded by 4^z keys regardless of input
size (z12 ⇒ ≤16.7M rows worldwide), so everything here operates on a table
that is tiny relative to the fact table that produced it. Each label
propagation sweep is ONE hash-shuffle join keyed on the 64-bit tile id,
and the sweep count equals the hot-region diameter in tiles — small for
real edit-density blobs. For adversarial snake-shaped regions,
``tile_regions(..., algorithm="star")`` switches to alternating
large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — O(log² n) rounds guaranteed regardless
of diameter, edge-list-sized state per round); the default min-label +
pointer-jumping loop stays because density blobs converge in a few
sweeps and its plan is the simplest to read in the Spark UI.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PI = 3.141592653589793

# id = (z << 52) | (x << 26) | y — unique for z ≤ 20 (x, y < 2^26), pure
# bigint math so the SQL oracle reproduces it exactly.
_Z_SHIFT = 1 << 52
_X_SHIFT = 1 << 26


def _merc_lat(yfrac: Column) -> Column:
    """Inverse web-mercator: tile-fraction y → latitude in degrees.

    degrees(atan(sinh(pi*(1-2*yfrac)))) with sinh spelled (e^t - e^-t)/2 —
    the exact expression the DuckDB oracle runs.
    """
    t = F.lit(_PI) * (F.lit(1.0) - F.lit(2.0) * yfrac)
    return F.degrees(F.atan((F.exp(t) - F.exp(-t)) / F.lit(2.0)))


def with_tile_bounds(
    tiles: DataFrame, z_col: str = "z", x_col: str = "x", y_col: str = "y"
) -> DataFrame:
    """Add west/south/east/north lon-lat bounds for each z/x/y tile."""
    n = F.pow(F.lit(2.0), F.col(z_col).cast("double"))
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    return (
        tiles.withColumn("west", F.round(x / n * F.lit(360.0) - F.lit(180.0), 9))
        .withColumn(
            "east", F.round((x + F.lit(1.0)) / n * F.lit(360.0) - F.lit(180.0), 9)
        )
        .withColumn("north", F.round(_merc_lat(y / n), 9))
        .withColumn("south", F.round(_merc_lat((y + F.lit(1.0)) / n), 9))
    )


def vectorize_tiles(tiles: DataFrame, min_density: float = 1) -> DataFrame:
    """Raster→vector: above-threshold tiles as lon/lat quad bounds.

    Input: (z, x, y, density) — the output shape of
    ``tiles.density_rollup``. Output adds (west, south, east, north).
    Narrow projection + filter only: no shuffle, fully codegen'd.
    """
    hot = tiles.filter(F.col("density") >= F.lit(min_density))
    return with_tile_bounds(hot).select(
        "z", "x", "y", "density", "west", "south", "east", "north"
    )


def quad_wkt(bounds: DataFrame) -> DataFrame:
    """WKT POLYGON text per tile quad (closed ring, counter-clockwise).

    Export-only convenience; float→string formatting is engine-specific so
    this column is pytest-verified (parse floats back), never
    oracle-hashed.
    """
    w, s, e, n = (F.col(c).cast("string") for c in ("west", "south", "east", "north"))
    sp, cm = F.lit(" "), F.lit(", ")
    return bounds.withColumn(
        "wkt",
        F.concat(
            F.lit("POLYGON(("),
            w, sp, s, cm, e, sp, s, cm, e, sp, n, cm, w, sp, n, cm, w, sp, s,
            F.lit("))"),
        ),
    )


def tile_id(z_col: str = "z", x_col: str = "x", y_col: str = "y") -> Column:
    return (
        F.col(z_col).cast("bigint") * F.lit(_Z_SHIFT)
        + F.col(x_col).cast("bigint") * F.lit(_X_SHIFT)
        + F.col(y_col).cast("bigint")
    )


def star_cc_labels(edges: DataFrame, max_sweeps: int = 30,
                   collect_cap: int = 300_000):
    """Connected components over an edge list via alternating
    large-star/small-star (Kiveris et al., SoCC'14 — public algorithm),
    with a size-gated driver union-find fast path for small edge lists.

    `edges`: (id, nbr_id) directed pairs (both directions present or not —
    the first step symmetrizes). Returns ``(labels, sweeps_used)`` where
    labels is (id, label) for every node THAT APPEARS IN AN EDGE, label =
    the component's minimum node id. Isolated nodes are the caller's
    coalesce.

    Why it exists next to the min-label+jump loop: propagation needs
    O(log diameter) sweeps WITH pointer jumping but each sweep carries the
    full label table through two joins; star contraction is guaranteed
    O(log² n) rounds on ANY topology (adversarial snakes included) and each
    round's state is just the shrinking edge list. Round = large-star
    (hang every node's larger neighbors under its minimum) then small-star
    (re-hang the smaller neighbors), each ONE groupBy + ONE join on the
    node id — the same shuffle key layout as the simple sweep, so skew
    handling (AQE) applies identically. At fixpoint every component is a
    star rooted at its minimum, so the label read-off is one-hop.

    Sweep-cost engineering (measured on tiny bounded graphs, where
    per-stage scheduling latency dominates; identical plans at scale):
    the edge set is kept ORIENTATION-NORMALIZED (u > v) as a loop
    invariant — large-star emits (v, m) with m ≤ u < v and small-star
    (v, m) with m = min ≤ v, so normalization is free after the entry
    step. That makes E ∪ reverse(E) duplicate-free (one distinct
    shuffle dropped per sweep) and makes the small-star input exactly
    the large-star output (a union + filter dropped). Convergence pays
    one count on the already-checkpointed result; the one-sided
    anti-join diff runs only when counts match (equal-size distinct
    sets are equal iff one difference is empty).

    Size gate (r6, guide §1.2): the normalized edge count is already a
    loop precondition, so when it is ≤ ``collect_cap`` the components are
    solved by ONE bounded collect + driver union-find + createDataFrame —
    the broadcast-join size rule applied to components (a ≤300k-row edge
    list is ~5 MB; nine distributed sweeps on it are pure scheduling
    latency, measured ~4.5 s at sf0.1 for the res-2 lattice whose size is
    geometry-bounded regardless of input rows). Above the cap — near-dup
    graphs CAN be unbounded — the star contraction runs unchanged; pass
    ``collect_cap=0`` to force it (tests pin both paths equal).
    """
    E = (
        edges.select(
            F.greatest(F.col("id"), F.col("nbr_id")).alias("u"),
            F.least(F.col("id"), F.col("nbr_id")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_cnt = E.count()
    if prev_cnt <= collect_cap:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:          # path compression
                parent[x], x = r, parent[x]
            return r

        for row in E.collect():
            u, v = row[0], row[1]
            if u not in parent:
                parent[u] = u
            if v not in parent:
                parent[v] = v
            ru, rv = find(u), find(v)
            if ru != rv:
                # union by MIN id: root IS the component minimum, so the
                # read-off below is a plain find() per node
                if ru < rv:
                    parent[rv] = ru
                else:
                    parent[ru] = rv
        rows = [(int(x), int(find(x))) for x in parent]
        labels = edges.sparkSession.createDataFrame(
            rows, "id long, label long"
        )
        return labels, 0
    sweeps = 0
    for _ in range(max_sweeps):
        sweeps += 1
        # E is (u > v)-normalized and distinct, so the two orientations
        # are disjoint: no distinct needed after the union
        sym = E.unionByName(
            E.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        # large-star: for each u, m = min(u ∪ N(u)); hang neighbors v > u on m
        m_lg = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        # no distinct here (r6, guide §2.4): duplicates in e1 change neither
        # m_sm's per-u minimum nor e2's post-distinct edge set — e2's own
        # distinct is the sweep's one dedup pass, so the extra exchange
        # bought nothing but a shuffle per sweep
        e1 = (
            sym.join(m_lg, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        # small-star input = each node's ≤-neighbors; e1 is already
        # (u > v)-normalized, so that is e1 itself — no re-symmetrize
        m_sm = e1.groupBy("u").agg(F.min("v").alias("m"))
        e2 = (
            e1.join(m_sm, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m_sm.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        cnt = e2.count()
        changed = (
            1
            if cnt != prev_cnt
            else e2.join(E, ["u", "v"], "left_anti").count()
        )
        E, prev_cnt = e2, cnt
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"star_cc_labels did not converge within max_sweeps={max_sweeps}"
        )
    # fixpoint edges are (node, root) stars: one-hop min read-off
    labels = (
        E.unionByName(E.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("label"))
        .select(F.col("u").alias("id"), "label")
    )
    return labels, sweeps


def tile_regions(
    tiles: DataFrame,
    min_density: float = 1,
    max_sweeps: int = 30,
    algorithm: str = "jump",
) -> DataFrame:
    """Merged hot-tile regions: 4-adjacency connected components.

    Output: (z, x, y, density, region_id) where region_id is the MINIMUM
    tile id in the component (deterministic, order-free — safe to
    oracle-hash). ``algorithm="star"`` routes the same hot/edge build
    through :func:`star_cc_labels` (guaranteed O(log² n) rounds on
    adversarial topologies); both algorithms produce identical labels.

    Algorithm: min-label propagation + pointer jumping. Labels start as
    each tile's own id; each sweep takes the min over self + 4-neighbors,
    then compresses label(id) ← label(label(id)) — the pointer-doubling
    step that turns O(component diameter) sweeps into O(log diameter)
    (a 1024-tile snake converges in ~10 sweeps, not ~1024; log2 of the
    worldwide z12 tile count is 24 < the default cap). Fixpoint when no
    label changes. The per-sweep ``count()`` is iteration CONTROL on the
    bounded tile table, not a data collect.

    Each sweep ends in ``localCheckpoint(eager=True)``: the sweep's plan
    references the previous label table TWICE (union + messages), so
    without lineage truncation the logical plan doubles per sweep and
    Catalyst analysis goes exponential — the standard iterative-DataFrame
    hazard (same pattern GraphX solves with periodic checkpoints). On a
    real cluster prefer ``spark.sparkContext.setCheckpointDir`` +
    ``checkpoint()`` for executor-loss resilience; localCheckpoint keeps
    the sandbox run self-contained. The ``hot``/``edges`` persists and the
    superseded per-sweep checkpoint blocks are reclaimed by the
    ContextCleaner once unreferenced (same posture as the other library
    operators — the caller's consuming action owns the lifetime).
    """
    if max_sweeps < 1:
        raise ValueError("max_sweeps must be >= 1")
    hot = (
        tiles.filter(F.col("density") >= F.lit(min_density))
        .select("z", "x", "y", "density", tile_id().alias("id"))
        .persist()
    )

    # Directed 4-adjacency edges (each unordered pair appears both ways,
    # which is exactly what undirected propagation needs).
    nbr = hot.select(
        "id",
        "z",
        F.explode(
            F.array(
                F.struct((F.col("x") + 1).alias("nx"), F.col("y").alias("ny")),
                F.struct((F.col("x") - 1).alias("nx"), F.col("y").alias("ny")),
                F.struct(F.col("x").alias("nx"), (F.col("y") + 1).alias("ny")),
                F.struct(F.col("x").alias("nx"), (F.col("y") - 1).alias("ny")),
            )
        ).alias("_n"),
    ).select("id", "z", F.col("_n.nx").alias("x"), F.col("_n.ny").alias("y"))
    edges = (
        nbr.join(
            hot.select("z", "x", "y", F.col("id").alias("nbr_id")), ["z", "x", "y"]
        )
        .select("id", "nbr_id")
        .persist()
    )
    edges.count()

    if algorithm == "star":
        star_labels, _ = star_cc_labels(edges, max_sweeps)
        # isolated hot tiles appear in no edge: they are their own region
        return (
            hot.join(star_labels, "id", "left")
            .select(
                "z", "x", "y", "density",
                F.coalesce("label", "id").alias("region_id"),
            )
        )
    if algorithm != "jump":
        raise ValueError(f"unknown algorithm {algorithm!r} (use 'jump' or 'star')")

    labels = hot.select("id", F.col("id").alias("label")).localCheckpoint()
    # fixpoint certificate: min-propagation labels are NON-INCREASING per
    # id, so Σ label strictly decreases on any change — comparing the sum
    # (exact decimal; bigint ids would overflow a long sum at z≥12 scale)
    # replaces a per-sweep join+count with a 1-row aggregate.
    prev_sum = labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]
    for _ in range(max_sweeps):
        msgs = edges.join(
            labels.select(F.col("id").alias("nbr_id"), "label"), "nbr_id"
        ).select("id", "label")
        prop = labels.unionByName(msgs).groupBy("id").agg(
            F.min("label").alias("label")
        )
        # pointer jumping: every label IS some hot tile's id, so jumping
        # through its current label halves chain depth each sweep
        jump = prop.select(
            F.col("id").alias("_jid"), F.col("label").alias("_jlabel")
        )
        new = (
            prop.join(jump, prop["label"] == jump["_jid"], "left")
            .select(
                "id",
                F.coalesce("_jlabel", "label").alias("label"),
            )
            .localCheckpoint()
        )
        new_sum = new.agg(F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]
        changed = int(new_sum != prev_sum)
        prev_sum = new_sum
        labels = new
        if changed == 0:
            break
    else:
        # silent partial merges are worse than a loud failure: labels that
        # haven't reached fixpoint mean two adjacent tiles can still carry
        # different region ids (ADVICE r2). With pointer jumping this needs
        # a component of diameter > 2^max_sweeps — raise the cap, don't trust
        # the output.
        raise RuntimeError(
            f"tile_regions did not converge within max_sweeps={max_sweeps} "
            f"({changed} labels still changing); raise max_sweeps"
        )

    return hot.join(labels, "id").select(
        "z", "x", "y", "density", F.col("label").alias("region_id")
    )
