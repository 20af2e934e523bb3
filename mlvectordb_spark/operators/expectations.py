"""Data-quality expectations: declarative constraints validated in one
pass, with quarantine/fail routing — the Delta Live Tables
`expect / expect_or_drop / expect_or_fail` surface (public API shape; cf.
Delta constraints `CHECK`/`NOT NULL`) re-expressed as plain DataFrame
algebra. A 100 TB ingest without constraint gates silently poisons every
downstream consumer; the reference has no validation surface at all
(vectors are accepted as-is, src/mlvectordb/implementations/storage.py).

Scale shape — the whole point of the design:

- Every ROW-LEVEL rule (not-null, range, set, regex, custom predicate)
  compiles to a boolean Column; `summary()` evaluates ALL of them in ONE
  scan as conditional aggregates (zero shuffles), and `split()` routes
  rows in ONE scan with an array-of-failed-rule-names column.
- UNIQUENESS is the only rule that needs a shuffle (one groupBy on the
  key set, map-side partial counts). It participates in `summary()` as a
  separate branch and in `split()` as one co-partitioned join.
- Nothing collects to the driver except the ≤|rules|-row summary.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mlvectordb_spark.functions.localdf import local_rows_df

_FAILED = "_failed_rules"


@dataclass(frozen=True)
class Rule:
    """A named row-level expectation. `cond` is TRUE when the row PASSES."""

    name: str
    cond: Column


def not_null(col: str) -> Rule:
    return Rule(f"not_null_{col}", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Rule:
    """NULL passes (pair with not_null to reject NULLs) — the SQL CHECK
    convention: a constraint on a NULL value is not a violation."""
    c = F.col(col)
    return Rule(
        f"in_range_{col}", c.isNull() | ((c >= F.lit(lo)) & (c <= F.lit(hi)))
    )


def in_set(col: str, values) -> Rule:
    c = F.col(col)
    return Rule(f"in_set_{col}", c.isNull() | c.isin(list(values)))


def matches(col: str, pattern: str) -> Rule:
    c = F.col(col)
    return Rule(f"matches_{col}", c.isNull() | c.rlike(pattern))


def expect(name: str, cond: Column) -> Rule:
    """Arbitrary predicate expectation (TRUE = pass)."""
    return Rule(name, cond)


@dataclass(frozen=True)
class ForeignKey:
    """Referential integrity: `col` values must exist in `ref[ref_col]`
    (NULLs pass — the SQL FK convention). The reference key set is
    deduplicated and broadcast, so the fact side is never shuffled; keep
    `ref` dimension-sized (the usual FK shape)."""

    col: str
    ref: DataFrame
    ref_col: str

    @property
    def name(self) -> str:
        return f"fk_{self.col}"

    @property
    def _marker(self) -> str:
        # dots sanitized: an alias named "__fk_meta.ck" would be parsed
        # back as struct access when referenced (nested FK columns are
        # supported; the marker must stay a flat name)
        return "__fk_" + self.col.replace(".", "_")

    def _ref_keys(self) -> DataFrame:
        return self.ref.select(
            F.col(self.ref_col).alias(self._marker)
        ).distinct()


class Expectations:
    """A rule set over one table: row-level rules, at most one
    uniqueness constraint (`unique_on`), and foreign keys."""

    def __init__(
        self,
        rules: list[Rule],
        unique_on: list[str] | None = None,
        foreign_keys: list[ForeignKey] | None = None,
    ):
        self.foreign_keys = list(foreign_keys) if foreign_keys else []
        self.rules = list(rules)
        self.unique_on = list(unique_on) if unique_on else None
        names = [r.name for r in rules] + [f.name for f in self.foreign_keys]
        if self.unique_on:
            # the synthetic uniqueness rule participates in the namespace
            # too — a row rule named the same would emit ambiguous
            # duplicate rows in summary() and double-append in annotate()
            names.append(f"unique_{'_'.join(self.unique_on)}")
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate rule names: {sorted(names)}")
        if not self.rules and not self.unique_on and not self.foreign_keys:
            raise ValueError("at least one rule or constraint is required")
        self._all_names = names

    def _with_fk_markers(self, df: DataFrame) -> tuple[DataFrame, list[Rule]]:
        """Graft one broadcast presence-marker per foreign key onto df and
        return the FK checks as ordinary row-level rules over the
        markers — FKs then ride the same one-scan machinery as every
        other rule (the fact side is never shuffled; each ref key set is
        deduplicated and broadcast)."""
        out = df
        synth: list[Rule] = []
        for fk in self.foreign_keys:
            marker = fk._marker
            keys = fk._ref_keys()
            out = out.join(
                F.broadcast(keys), out[fk.col] == keys[marker], "left_outer"
            )
            synth.append(
                Rule(
                    fk.name,
                    F.col(fk.col).isNull() | F.col(marker).isNotNull(),
                )
            )
        return out, synth

    # -- one-scan summary ---------------------------------------------------

    def summary(self, df: DataFrame) -> DataFrame:
        """(rule, violations, total) per rule — every row-level rule
        (including FK presence checks over broadcast-grafted markers) in
        ONE conditional-aggregate scan; uniqueness (if any) adds one
        grouped branch counting EVERY row of a duplicated key (the same
        rows annotate()/split() flag)."""
        parts = []
        df, synth = self._with_fk_markers(df)
        row_rules = self.rules + synth
        if row_rules:
            # when/otherwise (not a bare cast) so a NULL-valued custom
            # predicate counts as a PASS — the SQL CHECK convention every
            # surface here shares; coalesce keeps empty inputs at 0, and
            # backticks keep dotted rule names (nested fields) resolvable
            aggs = [F.count(F.lit(1)).alias("__total")] + [
                F.coalesce(
                    F.sum(F.when(~r.cond, F.lit(1)).otherwise(F.lit(0))),
                    F.lit(0),
                ).cast("long").alias(r.name)
                for r in row_rules
            ]
            wide = df.agg(*aggs)
            stack = F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r.name).alias("rule"),
                            F.col(f"`{r.name}`").alias("violations"),
                        )
                        for r in row_rules
                    ]
                )
            ).alias("__r")
            parts.append(
                wide.select(stack, F.col("__total")).select(
                    F.col("__r.rule").alias("rule"),
                    F.col("__r.violations").alias("violations"),
                    F.col("__total").alias("total"),
                )
            )
        if self.unique_on:
            # EVERY row of a duplicated key is a violation — the same rows
            # annotate()/split() flag (no arbitrary "first" survivor), so
            # the surfaces agree count-for-count (property-tested). NULL
            # keys form real groups, matching groupBy semantics.
            dup = df.groupBy(*self.unique_on).agg(
                F.count(F.lit(1)).alias("__n")
            )
            parts.append(
                dup.agg(
                    F.lit(f"unique_{'_'.join(self.unique_on)}").alias("rule"),
                    F.coalesce(
                        F.sum(
                            F.when(F.col("__n") > 1, F.col("__n")).otherwise(
                                F.lit(0)
                            )
                        ),
                        F.lit(0),
                    )
                    .cast("long")
                    .alias("violations"),
                    F.coalesce(F.sum("__n"), F.lit(0))
                    .cast("long")
                    .alias("total"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def summary_from_annotated(self, ann: DataFrame) -> DataFrame:
        """The summary() result derived from an ALREADY-annotated frame
        (same schema, same counts — agreement is by construction, not by
        two parallel plans). Use when `annotate`'s output is persisted
        anyway (e.g. the streaming ingest gate): one cache scan replaces
        re-evaluating every predicate, re-grafting FK broadcasts, and the
        uniqueness shuffle."""
        spark = ann.sparkSession
        base = local_rows_df(spark, 
            [(n,) for n in self._all_names], "rule string"
        )
        counts = (
            ann.select(F.explode(F.col(_FAILED)).alias("rule"))
            .groupBy("rule")
            .agg(F.count(F.lit(1)).cast("long").alias("violations"))
        )
        total = ann.count()
        return base.join(counts, "rule", "left_outer").select(
            "rule",
            F.coalesce(F.col("violations"), F.lit(0))
            .cast("long")
            .alias("violations"),
            F.lit(total).cast("long").alias("total"),
        )

    # -- one-scan routing ---------------------------------------------------

    @staticmethod
    def _failed_array(row_rules: list[Rule]) -> Column:
        return F.filter(
            F.array(
                *[
                    F.when(~r.cond, F.lit(r.name)).otherwise(F.lit(None))
                    for r in row_rules
                ]
            ),
            lambda x: x.isNotNull(),
        )

    def annotate(self, df: DataFrame) -> DataFrame:
        """Add `_failed_rules: array<string>` (empty = clean). Row-level
        rules (incl. broadcast FK presence checks) stay a single
        projection; uniqueness joins each row against its key's count
        (one shuffle, co-partitioned with the groupBy)."""
        marked, synth = self._with_fk_markers(df)
        row_rules = self.rules + synth
        out = marked.withColumn(
            _FAILED,
            self._failed_array(row_rules)
            if row_rules
            else F.array().cast("array<string>"),
        ).select(*df.columns, _FAILED)
        if self.unique_on:
            keys = self.unique_on
            # renamed key columns sidestep self-join attribute ambiguity
            # (the groupBy keeps the grouping columns' identities)
            dup_keys = (
                df.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .select(
                    *[F.col(k).alias(f"__k_{k}") for k in keys],
                    F.lit(True).alias("__dup"),
                )
            )
            cond = [
                F.col(k).eqNullSafe(F.col(f"__k_{k}")) for k in keys
            ]
            rule = f"unique_{'_'.join(keys)}"
            out = (
                out.join(dup_keys, cond, "left_outer")
                .select(
                    *df.columns,
                    F.when(
                        F.col("__dup"),
                        F.array_append(F.col(_FAILED), F.lit(rule)),
                    )
                    .otherwise(F.col(_FAILED))
                    .alias(_FAILED),
                )
            )
        return out

    def split(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(clean, quarantined): quarantined rows keep `_failed_rules` for
        triage; clean rows come back with the original schema. Callers
        should persist/checkpoint the annotated frame if they consume
        both sides (two actions over one lineage otherwise)."""
        ann = self.annotate(df)
        clean = ann.filter(F.size(_FAILED) == 0).drop(_FAILED)
        bad = ann.filter(F.size(_FAILED) > 0)
        return clean, bad

    def enforce(self, df: DataFrame) -> DataFrame:
        """expect_or_fail: returns df (original schema) but the first
        violating row raises at execution time. Built on `annotate` so
        ALL three surfaces share one semantic — NULL predicates pass
        (SQL CHECK), and `unique_on` IS enforced (it costs the same one
        key shuffle it costs everywhere else; row-level-only rule sets
        stay a single projection with no extra pass)."""
        ann = self.annotate(df)
        ok = F.size(F.col(_FAILED)) == 0
        # the assert rides the filter's own evaluation (same idiom as
        # operators/mv.py's feed check): passing rows short-circuit to 1,
        # the first violating row raises — not foldable
        flag = F.when(ok, F.lit(1)).otherwise(
            F.assert_true(
                ok,
                F.lit("expectation violated; use split() to quarantine"),
            ).cast("int")
        )
        return ann.filter(flag == 1).drop(_FAILED)
