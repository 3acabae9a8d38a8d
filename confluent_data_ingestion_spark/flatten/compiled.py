"""Schema-compiled JSON flattener: the same row/lineage semantics as
``flatten_json`` (reference ``scripts/json_flattener_v2.py:123-208``), but
compiled at plan time from a declared Spark schema into pure JVM operators —
``from_json`` + ``posexplode`` chains, with ``_row_id``/``_parent_id``
derived from cumulative-count ``aggregate()`` folds.  No Python executes per
row, so the flatten runs inside whole-stage codegen and scales linearly with
zero shuffle.

Use this path when the document shape is known (the normal case for a
production feed); ``flatten_df`` (mapInPandas) remains the fallback for
schema-discovery over heterogeneous documents.

Semantics parity with the per-doc Python walk, verified by differential
tests (tests/test_flattener.py):

 - Only arrays produce rows; scalars inherit downward path-prefixed.
 - Array of scalars: one row per element, value in the path-named column.
 - Array of structs: parent row per element (when the struct declares scalar
   fields), nested arrays' rows carry ``_parent_id`` = parent ``_row_id``.
 - Array of arrays (scalar inner): inner elements expand at the same table
   name with the outer index in the JSON-pointer path.
 - ``_row_id`` is the document-scoped depth-first emit ordinal, computed as
   offset expressions: preceding-sibling counts via ``aggregate(slice(...))``
   folds over the arrays themselves.

Implementation note: every struct path (scalars AND arrays) is materialized
as a top-level column BEFORE any explode — expressions inside branches only
reference plain columns.  Referencing nested paths like ``doc.a.b`` across
Generate+Union nodes trips Spark's nested-column aliasing
(INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND), and early materialization is also the
plan you want: one struct-field extraction per document, shared by all
branches.

Declared-schema mode cannot distinguish a missing key from an explicit
``null`` (``from_json`` yields NULL for both), so a struct array element
always emits its parent row when the struct type declares scalar fields;
the Python walk skips elements with no scalar keys present.  Identical on
any feed whose documents carry their declared fields.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, StructType

LINEAGE_COLS = ("tableName", "_row_id", "_parent_id", "_path", "_elem_index", "_depth")


def _is_scalar_type(dt: DataType) -> bool:
    return not isinstance(dt, (StructType, ArrayType))


def _scalar_fields(st: StructType) -> list:
    return [f for f in st.fields if _is_scalar_type(f.dataType)]


def _nested_fields(st: StructType) -> list:
    return [f for f in st.fields if not _is_scalar_type(f.dataType)]


def _count_array(at: ArrayType, val: str, depth: int = 1,
                 max_depth: int | None = None,
                 emit_empty_parent: bool = False) -> str:
    """SQL expr: rows the walk emits for array value ``val`` (any column or
    lambda-variable reference) whose list depth is ``depth``.  ``max_depth``
    prunes exactly like the Python walk's guard, and ``emit_empty_parent``
    adds the scalar-less parent rows the walk emits under that flag — counts
    MUST mirror the emission rules or row ids diverge."""
    if max_depth is not None and depth > max_depth:
        return "0L"
    et = at.elementType
    if _is_scalar_type(et):
        return f"coalesce(CAST(size({val}) AS BIGINT), 0L)"
    if isinstance(et, StructType):
        per_elem = _count_struct_elem(et, "x", depth, max_depth, emit_empty_parent)
        return f"coalesce(aggregate({val}, 0L, (acc, x) -> acc + {per_elem}), 0L)"
    if _is_scalar_type(et.elementType):  # array of arrays of scalars
        if max_depth is not None and depth + 1 > max_depth:
            return "0L"
        return (f"coalesce(aggregate({val}, 0L, "
                f"(acc, x) -> acc + coalesce(CAST(size(x) AS BIGINT), 0L)), 0L)")
    raise NotImplementedError(
        f"flatten_with_schema: unsupported array element {et.simpleString()}"
    )


def _count_struct_elem(st: StructType, val: str, depth: int = 1,
                       max_depth: int | None = None,
                       emit_empty_parent: bool = False) -> str:
    """Rows emitted for ONE element of an array-of-structs: the parent row
    (iff the struct declares scalar fields, or ``emit_empty_parent`` and it
    declares nested fields — same condition ``_emit_array`` emits on) plus
    its nested subtrees."""
    emits = bool(_scalar_fields(st)) or (
        emit_empty_parent and bool(_nested_fields(st)))
    parts = ["1L"] if emits else ["0L"]
    for f in _nested_fields(st):
        ref = f"{val}.`{f.name}`"
        if isinstance(f.dataType, StructType):
            parts.append(_count_struct_dict(f.dataType, ref, depth + 1,
                                            max_depth, emit_empty_parent))
        else:
            parts.append(_count_array(f.dataType, ref, depth + 1, max_depth,
                                      emit_empty_parent))
    return "(" + " + ".join(parts) + ")"


def _count_struct_dict(st: StructType, val: str, depth: int = 1,
                       max_depth: int | None = None,
                       emit_empty_parent: bool = False) -> str:
    parts = []
    for f in _nested_fields(st):
        ref = f"{val}.`{f.name}`"
        if isinstance(f.dataType, StructType):
            parts.append(_count_struct_dict(f.dataType, ref, depth + 1,
                                            max_depth, emit_empty_parent))
        else:
            parts.append(_count_array(f.dataType, ref, depth + 1, max_depth,
                                      emit_empty_parent))
    return "(" + " + ".join(parts) + ")" if parts else "0L"


@dataclass
class _Bound:
    """A dict subtree flattened onto top-level columns of a DataFrame."""

    # walk-ordered arrays, each with ITS OWN inherited-scalar scope
    # ("scoped inheritance": sibling branches never leak):
    # (out_path, ptr_suffix, rel_depth, type, column, inherited)
    arrays: list[tuple[str, str, int, ArrayType, str, list]] = field(
        default_factory=list)


class _Compiler:
    def __init__(self, joiner: str, emit_empty_parent: bool,
                 max_depth: int | None = None):
        self.joiner = joiner
        self.emit_empty_parent = emit_empty_parent
        self.max_depth = max_depth
        self.branches: list[tuple[DataFrame, list[Column], set[str]]] = []
        self.data_cols: dict[str, DataType] = {}
        self.n = 0

    def _uniq(self, tag: str) -> str:
        self.n += 1
        return f"__{tag}{self.n}__"

    # -- binding: materialize a struct subtree as top-level columns ---------
    def _bind_dict(self, st: StructType, val: str, path: str, ptr: str,
                   sel: list[Column], out: _Bound, rel_depth: int = 0,
                   inherited: list | None = None) -> list:
        """Collect select-exprs for every scalar (named by path-prefixed
        output name) and every array (uniquely named) under dict ``val``;
        record walk order + nesting depth + per-array inherited scope in
        ``out.arrays``.  Returns ``inherited`` + this dict's own scalars."""
        pfx = f"{path}{self.joiner}" if path else ""
        level = list(inherited or [])
        for f in _scalar_fields(st):
            name = f"{pfx}{f.name}"
            sel.append(F.expr(f"{val}.`{f.name}`").alias(name))
            level.append((name, f.dataType))
        for f in _nested_fields(st):
            ref = f"{val}.`{f.name}`"
            child_path = f"{pfx}{f.name}"
            child_ptr = f"{ptr}/{f.name}"
            if isinstance(f.dataType, StructType):
                self._bind_dict(f.dataType, ref, child_path, child_ptr, sel,
                                out, rel_depth + 1, level)
            else:
                col = self._uniq("a")
                sel.append(F.expr(ref).alias(col))
                out.arrays.append(
                    (child_path, child_ptr, rel_depth + 1, f.dataType, col,
                     level))
        return level

    # -- emission -----------------------------------------------------------
    def _row(self, df: DataFrame, table: str, row_id: str, parent: str,
             path: Column, idx: str, depth: int,
             inherited: list[tuple[str, DataType]],
             extra: list[tuple[str, Column, DataType]]) -> None:
        cols = [
            F.col("doc_key"),
            F.lit(table).alias("tableName"),
            F.expr(row_id).cast("bigint").alias("_row_id"),
            F.expr(parent).cast("bigint").alias("_parent_id"),
            path.alias("_path"),
            F.expr(idx).cast("int").alias("_elem_index"),
            F.lit(depth).cast("int").alias("_depth"),
        ]
        names = set()
        for name, dt in inherited:
            cols.append(F.col(f"`{name}`"))
            self.data_cols.setdefault(name, dt)
            names.add(name)
        for name, c, dt in extra:
            cols.append(c.alias(name))
            self.data_cols.setdefault(name, dt)
            names.add(name)
        self.branches.append((df, cols, names))

    def walk_arrays(self, df: DataFrame, bound: _Bound, ptr_col: Column | None,
                    base_depth: int, parent: str, offset: str) -> str:
        """Emit branches for each array recorded on ``bound`` in walk order.
        ``ptr_col`` is a dynamic pointer prefix (inside struct-array
        elements) or None at doc level (static pointers).  Row depth is
        ``base_depth`` + the array's nesting depth within the bound dict."""
        for out_path, ptr_sfx, rel_depth, at, col, inherited in bound.arrays:
            depth = base_depth + rel_depth
            if self.max_depth is None or depth <= self.max_depth:
                base_ptr = (F.concat(ptr_col, F.lit(ptr_sfx))
                            if ptr_col is not None else F.lit(ptr_sfx))
                self._emit_array(df, at, col, out_path, base_ptr, depth,
                                 inherited, parent, offset)
            # pruned arrays count 0 rows, so the offset stays in sync
            offset = (
                f"({offset} + "
                f"{_count_array(at, f'`{col}`', depth, self.max_depth, self.emit_empty_parent)})"
            )
        return offset

    def _counts_col(self, df: DataFrame, col: str, per_elem: str):
        """Materialize per-element emitted-row counts of array ``col`` as a
        sibling array column, computed ONCE per document row.  The returned
        ``cum_of(i)`` builds the preceding-sibling offset for exploded
        position ``i`` by folding the PRE-COMPUTED longs — without this the
        count expression (itself a fold for struct elements) re-evaluates
        per (element, preceding-position) pair: O(len^2 * count_cost) per
        document on long arrays instead of O(len * count_cost + len^2)
        plain additions."""
        c = self._uniq("c")
        out = df.withColumn(c, F.expr(f"transform(`{col}`, x -> {per_elem})"))

        def cum_of(i: str) -> str:
            return (f"coalesce(aggregate(slice(`{c}`, 1, `{i}`), 0L, "
                    f"(acc, x) -> acc + x), 0L)")

        return out, cum_of

    def _emit_array(self, df: DataFrame, at: ArrayType, col: str, path: str,
                    ptr: Column, depth: int,
                    inherited: list[tuple[str, DataType]], parent: str,
                    offset: str) -> None:
        et = at.elementType
        if _is_scalar_type(et):
            i, v = self._uniq("i"), self._uniq("v")
            b = df.select("*", F.posexplode(F.col(f"`{col}`")).alias(i, v))
            self._row(
                b, path, f"({offset} + `{i}` + 1)", parent,
                F.concat(ptr, F.lit("/"), F.col(i).cast("string")),
                f"`{i}`", depth, inherited, [(path, F.col(f"`{v}`"), et)],
            )
            return
        if isinstance(et, ArrayType):
            if self.max_depth is not None and depth + 1 > self.max_depth:
                return  # inner lists would be walked past the depth cap
            df, cum_of = self._counts_col(
                df, col, "coalesce(CAST(size(x) AS BIGINT), 0L)")
            i1, v1 = self._uniq("i"), self._uniq("v")
            b1 = df.select("*", F.posexplode(F.col(f"`{col}`")).alias(i1, v1))
            cum = cum_of(i1)
            i2, v2 = self._uniq("i"), self._uniq("v")
            b2 = b1.select("*", F.posexplode(F.col(f"`{v1}`")).alias(i2, v2))
            self._row(
                b2, path, f"({offset} + {cum} + `{i2}` + 1)", parent,
                F.concat(ptr, F.lit("/"), F.col(i1).cast("string"),
                         F.lit("/"), F.col(i2).cast("string")),
                f"`{i2}`", depth + 1, inherited,
                [(path, F.col(f"`{v2}`"), et.elementType)],
            )
            return
        # array of structs
        df, cum_of = self._counts_col(
            df, col,
            _count_struct_elem(et, "x", depth, self.max_depth,
                               self.emit_empty_parent))
        i, e = self._uniq("i"), self._uniq("e")
        exploded = df.select("*", F.posexplode(F.col(f"`{col}`")).alias(i, e))
        elem_bound = _Bound()
        sel: list[Column] = []
        elem_scope = self._bind_dict(et, f"`{e}`", path, "", sel, elem_bound,
                                     rel_depth=0, inherited=inherited)
        b = exploded.select("*", *sel)
        elem_ptr = F.concat(ptr, F.lit("/"), F.col(i).cast("string"))
        cum = cum_of(i)
        # mirror the Python walk's ``scalars or (emit_empty_parent and
        # has_children)``: in declared-schema mode has_children = the struct
        # declares ANY nested field (struct or array), and _count_struct_elem
        # counts with the identical condition so row ids stay in sync
        emits_parent = bool(_scalar_fields(et)) or (
            self.emit_empty_parent and bool(_nested_fields(et)))
        parent_row_id = f"({offset} + {cum} + 1)"
        if emits_parent:
            # parent row carries inherited + the element's OWN scalars only
            self._row(b, path, parent_row_id, parent, elem_ptr, f"`{i}`",
                      depth, elem_scope, [])
            child_parent, child_offset = parent_row_id, parent_row_id
        else:
            child_parent, child_offset = parent, f"({offset} + {cum})"
        self.walk_arrays(b, elem_bound, elem_ptr, depth, child_parent,
                         child_offset)


def flatten_with_schema(
    df: DataFrame,
    schema: StructType,
    payload_col: str = "val",
    key_col: str | None = None,
    joiner: str = "_",
    emit_empty_parent: bool = False,
    max_depth: int | None = None,
) -> DataFrame:
    """Flatten JSON documents with a DECLARED schema into lineage rows using
    only JVM operators (``from_json`` + ``posexplode`` + fold expressions).

    Output: ``doc_key`` + the six lineage columns + the union of every
    table's typed data columns (NULL where a table doesn't carry a column).
    Same row set as ``flatten_df`` modulo the missing-vs-null caveat in the
    module docstring.
    """
    if not isinstance(schema, StructType):
        raise NotImplementedError("flatten_with_schema requires a StructType root")
    key = (F.col(key_col).cast("string") if key_col
           else F.monotonically_increasing_id().cast("string"))
    parsed = df.select(
        key.alias("doc_key"),
        F.from_json(F.col(payload_col), schema).alias("__doc__"),
    )
    c = _Compiler(joiner, emit_empty_parent, max_depth)
    root = _Bound()
    sel: list[Column] = []
    c._bind_dict(schema, "__doc__", "", "", sel, root)
    base = parsed.select("doc_key", *sel)
    c.walk_arrays(base, root, None, 0, "CAST(NULL AS BIGINT)", "0L")
    if not c.branches:
        if not root.arrays:
            raise ValueError("schema declares no arrays: nothing to flatten")
        # every array sits beyond max_depth: zero rows, stable lineage schema
        return parsed.select(
            "doc_key", F.lit("").alias("tableName"),
            F.lit(None).cast("bigint").alias("_row_id"),
            F.lit(None).cast("bigint").alias("_parent_id"),
            F.lit("").alias("_path"),
            F.lit(None).cast("int").alias("_elem_index"),
            F.lit(None).cast("int").alias("_depth"),
        ).limit(0)
    data_names = list(c.data_cols)
    outs = []
    for b, cols, present in c.branches:
        sel2 = list(cols)
        for name in data_names:
            if name not in present:
                sel2.append(F.lit(None).cast(c.data_cols[name]).alias(name))
        outs.append(b.select(*sel2))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
