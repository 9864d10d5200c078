"""Pipeline orchestration — the Spark lifecycle replacing the
reference's signal -> Celery -> execute() chain (E1 in SURVEY.md §3).

DAG per run (batch, ``availableNow``-style):

    transcripts (initial)
        -> checked                  (derive channel, checks, gap-fill)
        -> agg tiers                (regularize -> aggregate, per config)
        -> rollup 1min -> 1H -> 1D  (continuous aggregates)

Each stage: read HWM checkpoint -> incremental slice -> transform ->
TierTable.append (atomic) -> advance HWM, with lineage (source ->
target snapshot) and throughput metrics recorded on both the snapshot
properties and the checkpoint run log (north rule).

Incremental contract (matches the reference's, coarsened): the
reference reads each series from ``target.end_date + 1min``
(models.py:61-65), i.e. it assumes per-series event-time-monotone
ingestion. Here the checkpoint key is the hash-bucket of conv_id
(per-partition checkpoints at 10^12-turn scale), so the contract is
monotone ingestion per bucket. When that assumption cannot hold
(late / out-of-order uploads), use incremental.py's
SnapshotIncrementalRollup instead: snapshot-range source reads +
merge-on-read tiers stay exact under arbitrary arrival order.
HWM advancement is stage-aware:

- ``checked``: max processed source ts per bucket (raw rows are final
  the moment they're checked);
- aggregated/rollup tiers: max EMITTED bucket-end per bucket — a
  trimmed (MISS) or boundary-incomplete bucket stays below the HWM, so
  its source rows are re-read and the bucket recomputed when more data
  arrives — the distributed generalization of the reference's
  trim-last-and-recompute (models.py:513-533).

Idempotence: re-running with no new source rows appends nothing
(mirrors "already-complete target yields empty",
tests/test_models.py:1021-1028). Kill between append and advance =
one slice reprocessed; tier rows are keyed by (key, ts) so readers
dedup naturally (at-least-once, like Celery redelivery in the
reference).

Skew: aggregations are partial+final (map-side combine absorbs hot
conv_ids); the per-key serial stages — rocc's window sort and pandas
gap-fill — are time-chunked for hot conversations by default
(``hot_key_chunking``: rocc chunks unconditionally via JVM halo
windows, gap-fill routes multi-chunk-span keys to the chunked variant
— see operators/rocc.py and gap_fill_auto).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cache import release_caches
from .config import PipelineConfig
from .operators import aggregate, gap_fill, gap_fill_sql, regularize, run_checks
from .operators.gapfill import gap_fill_auto
from .rollup import rollup_tier, rollup_transcripts
from .schema import transcripts_to_series
from .storage import CheckpointStore, TierTable
from .timeutil import MICROS, parse_step


@dataclass
class StageResult:
    stage: str
    rows_out: int
    seconds: float
    snapshot_id: int | None

    @property
    def rows_per_sec(self) -> float:
        return self.rows_out / self.seconds if self.seconds > 0 else 0.0


class Pipeline:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        cfg: PipelineConfig,
        channel: str = "text_len",
        n_buckets: int = 64,
        use_sql_gapfill: bool = False,
        gap_fill_enabled: bool = True,
        max_gap_slots: int | None = 60,
        compress_tiers: bool = False,
        hot_key_chunking: bool = True,
        hot_chunk_span_seconds: int = 7 * 86400,
        fused_rollups: bool = False,
    ):
        """``hot_key_chunking`` (default on): the two per-key serial
        stages — the rate-of-change window sort and the pandas
        gap-fill — split hot conversations into
        ``hot_chunk_span_seconds`` time chunks so one conversation
        holding 1% of 10^12 turns is span/chunk parallel tasks, not
        one straggler. rocc chunks unconditionally (JVM window frames,
        ~free); gap-fill routes only keys spanning more than one chunk
        to the chunked variant (per-group pandas overhead would ruin
        the common case — see gap_fill_auto). Output is identical
        either way — including on dirty input with duplicate
        (key, ts) rows, where both variants elect the same slot
        winner via the (ts, value, flags) tie-break (pinned by
        tests) — so the knob is excluded from the config hash and
        flipping it does not invalidate checkpoints.
        """
        self.spark = spark
        self.cfg = cfg
        self.channel = channel
        self.root = root
        self.ckpt = CheckpointStore(os.path.join(root, "checkpoints.json"), n_buckets)
        # O2 config-change trigger (models.py:67-70): a changed config
        # invalidates all HWMs so affected series reprocess fully.
        import hashlib

        cfg_repr = repr((cfg, channel, use_sql_gapfill, gap_fill_enabled, max_gap_slots))
        self.config_invalidated = self.ckpt.ensure_config(
            hashlib.sha256(cfg_repr.encode()).hexdigest()[:16]
        )
        self.tables: dict[str, TierTable] = {}
        self.use_sql_gapfill = use_sql_gapfill
        self.gap_fill_enabled = gap_fill_enabled
        self.max_gap_slots = max_gap_slots
        self.compress_tiers = compress_tiers
        self.hot_key_chunking = hot_key_chunking
        self.hot_chunk_span_seconds = hot_chunk_span_seconds
        # ``fused_rollups``: compute the coarser rollup tiers from the
        # in-memory finer slice instead of re-reading the finer tier's
        # freshly written parquet (see run_rollups). Output-identical
        # (pinned by tests), so — like hot_key_chunking — the knob is
        # excluded from the config hash and never invalidates
        # checkpoints.
        self.fused_rollups = fused_rollups

    def table(self, name: str) -> TierTable:
        if name not in self.tables:
            # days(ts) hidden partitioning on every tier (hypertable
            # analog, S6): incremental consumers prune whole day
            # directories via read(min_ts_us=...). Gorilla blob tiers
            # have no ts column; they partition by the chunk's END
            # timestamp (chunk_end_us) — a day directory then only
            # holds chunks whose every point precedes the next day, so
            # retention's __day= drops stay keep-side-safe even for
            # chunks straddling midnight.
            self.tables[name] = TierTable(
                os.path.join(self.root, name),
                partition_days_col=(
                    "chunk_end_us" if name.endswith("_gorilla") else "ts"
                ),
            )
        return self.tables[name]

    # ------------------------------------------------------------------

    def _commit(
        self,
        stage: str,
        out_df: DataFrame,
        hwm_df: DataFrame,
        hwm_key: str,
        t0: float,
        lineage: dict,
        keep_persisted: bool = False,
    ) -> StageResult:
        """Persist output, append snapshot, advance HWM from hwm_df
        (columns: hwm_key + ts). ``keep_persisted`` leaves ``out_df``
        cached for a downstream consumer (fused rollups reuse the
        finer tier in memory); the caller then owns the unpersist."""
        table = self.table(stage)
        out = out_df.persist()
        # one agg over the persisted frame gives the manifest row count
        # AND the snapshot's ts pruning range — append() then skips its
        # post-write stats re-scan entirely.
        ts_stat = (
            F.unix_micros(F.col("ts").cast("timestamp"))
            if "ts" in out.columns
            else F.lit(None).cast("long")
        )
        rows_out, ts_min, ts_max = out.agg(
            F.count(F.lit(1)), F.min(ts_stat), F.max(ts_stat)
        ).first()
        snap = None
        if rows_out:
            elapsed = time.time() - t0
            snap = table.append(
                out,
                properties={
                    **lineage,
                    "rows": rows_out,
                    "seconds": round(elapsed, 3),
                    "rows_per_sec": round(rows_out / max(elapsed, 1e-9), 1),
                },
                stats={"rows": rows_out, "min_ts_us": ts_min, "max_ts_us": ts_max},
            )
        self.ckpt.advance(
            stage,
            hwm_df,
            key_col=hwm_key,
            lineage={**lineage, "snapshot": snap.snapshot_id if snap else None},
        )
        res = StageResult(
            stage,
            rows_out=rows_out,
            seconds=time.time() - t0,
            snapshot_id=snap.snapshot_id if snap else None,
        )
        if not keep_persisted:
            out.unpersist()
        return res

    # ------------------------------------------------------------------

    def run_checked(self, transcripts: DataFrame) -> StageResult:
        """initial -> checked: derive channel, run checks, optional
        gap-fill. HWM: processed source rows."""
        t0 = time.time()
        fresh = self.ckpt.filter_new(transcripts, "checked", key_col="conv_id")
        series = transcripts_to_series(fresh, channel=self.channel)
        checked = run_checks(
            series,
            self.cfg,
            chunk_span_seconds=(
                self.hot_chunk_span_seconds if self.hot_key_chunking else None
            ),
        )
        if self.gap_fill_enabled:
            step = parse_step(self.cfg.source_time_step)
            # conv_id/turn_idx ride through the gap-fill schema (both
            # variants round-trip extra columns; inserted grid rows get
            # them NULL) — re-attaching them with a (key, ts) equi-join
            # against the checked output would re-shuffle the whole
            # checked table once more per run for nothing.
            narrow = checked.select(
                "key", "ts", "value", "flags", "conv_id", "turn_idx"
            )
            hot_span_slots = self.hot_chunk_span_seconds * MICROS // step.micros
            if self.use_sql_gapfill:
                checked = gap_fill_sql(
                    narrow, step, max_gap_slots=self.max_gap_slots
                )
            elif (
                self.hot_key_chunking
                and self.max_gap_slots is not None
                and hot_span_slots > self.max_gap_slots + 1
            ):
                checked = gap_fill_auto(
                    narrow,
                    step,
                    max_gap_slots=self.max_gap_slots,
                    hot_span_slots=hot_span_slots,
                )
            else:
                checked = gap_fill(
                    narrow, step, max_gap_slots=self.max_gap_slots
                )
        res = self._commit(
            "checked",
            checked,
            fresh.select(F.col("conv_id"), F.col("ts")),
            "conv_id",
            t0,
            {"source": "transcripts"},
        )
        release_caches(checked)
        return res

    def run_agg_tier(self, cfg_index: int = 0) -> StageResult:
        """checked -> aggregated tier (reference semantics:
        regularize -> aggregate -> trim). HWM: emitted bucket ends."""
        t0 = time.time()
        cfg = self.cfg.aggregations[cfg_index]
        stage = f"agg_{cfg.target_time_step}_{cfg.method}"
        src = self.table("checked").read(
            self.spark, min_ts_us=self.ckpt.global_min_hwm(stage)
        )
        if src is None:
            return StageResult(stage, 0, time.time() - t0, None)
        fresh = self.ckpt.filter_new(src, stage, key_col="key")
        from .operators.regularize import mode_for_method

        reg = regularize(
            fresh.select("key", "ts", "value", "flags"),
            parse_step(self.cfg.source_time_step),
            mode=mode_for_method(cfg.method),
        )
        # trim against the RAW slice end (models.py:470) — also avoids
        # recomputing the regularize subtree for a per-key max
        agg = aggregate(reg, cfg, self.cfg.source_time_step, source_df=fresh)
        # HWM = emitted bucket end = label + offset (models.py:527-529)
        hwm = agg.select(
            F.col("key"),
            F.timestamp_micros(
                F.unix_micros(F.col("ts")) + F.lit(cfg.offset_minutes * 60 * MICROS)
            ).alias("ts"),
        )
        res = self._commit(stage, agg, hwm, "key", t0, {"source": "checked"})
        if self.compress_tiers and res.rows_out:
            # Gorilla-compressed copy of the slice just committed
            # (north-star tier storage): blobs per (key, chunk) with the
            # flags array riding alongside — lossless round-trip pinned
            # by tests/test_pipeline_storage.py.
            from .storage.gorilla import compress_series

            t1 = time.time()
            snap = self.table(stage).current_snapshot()
            slice_df = self.spark.read.parquet(snap.data_dir)
            comp = compress_series(slice_df, flags_col="flags")
            self.table(f"{stage}_gorilla").append(
                comp,
                properties={
                    "source": stage,
                    "source_snapshot": snap.snapshot_id,
                    "seconds": round(time.time() - t1, 3),
                },
            )
        return res

    def run_quantile_tier(
        self, cfg_index: int = 0, finalize: bool = True
    ) -> StageResult:
        """checked -> per-(key, bucket) quantile tier
        (``QuantileRollupConfig``; VERDICT r05 #4 — the auto routing
        existed but nothing exposed it declaratively).

        With ``hot_count_threshold`` set the tier runs through
        ``quantile_rollup_auto``: hot (key, bucket) groups use the
        mergeable sketch, cold groups stay bit-exact. HWM: emitted
        bucket ends — quantiles do NOT compose across slices, so a
        bucket that may still receive rows is held back (``finalize=
        False`` trims at the last complete bucket boundary) and
        recomputed from the re-read source rows when more data
        arrives, exactly like the agg tiers' trim-last contract.
        NaN/NULL values (check-rejected points) are excluded: the
        quantile of a bucket is over its PRESENT values."""
        t0 = time.time()
        cfg = self.cfg.quantile_rollups[cfg_index]
        stage = f"quantile_{cfg.target_time_step}"
        src = self.table("checked").read(
            self.spark, min_ts_us=self.ckpt.global_min_hwm(stage)
        )
        if src is None:
            return StageResult(stage, 0, time.time() - t0, None)
        fresh = self.ckpt.filter_new(src, stage, key_col="key")
        step = parse_step(cfg.target_time_step)
        from .rollup import bucket_end, quantile_rollup, quantile_rollup_auto

        bucketed = fresh.where(
            F.col("value").isNotNull() & ~F.isnan("value")
        ).select("key", bucket_end(F.col("ts"), step).alias("ts"), "value")
        if not finalize:
            max_ts = fresh.agg(F.max(F.unix_micros("ts"))).first()[0]
            if max_ts is not None:
                boundary = (max_ts // step.micros) * step.micros
                bucketed = bucketed.where(
                    F.unix_micros("ts") <= F.lit(boundary)
                )
        if cfg.hot_count_threshold is not None:
            out = quantile_rollup_auto(
                bucketed,
                ("key", "ts"),
                "value",
                cfg.quantiles,
                hot_count_threshold=cfg.hot_count_threshold,
                accuracy=cfg.accuracy,
            )
        else:
            out = quantile_rollup(bucketed, ("key", "ts"), "value", cfg.quantiles)
        res = self._commit(
            stage, out, out.select("key", "ts"), "key", t0, {"source": "checked"}
        )
        release_caches(out)
        return res

    def run_rollups(
        self,
        transcripts: DataFrame,
        finalize: bool = False,
        fused: bool | None = None,
    ) -> list[StageResult]:
        """Continuous-aggregate tiers 1min -> 1H -> 1D.

        Unless ``finalize``, each tier only emits buckets ending at or
        before the slice's last complete bucket boundary, so a bucket
        that may still receive rows stays un-emitted and below the HWM
        (the rollup analog of trim-last).

        ``fused`` (default: the constructor's ``fused_rollups``,
        VERDICT r05 #7): the cascade path re-reads each finer
        TierTable from storage AFTER appending to it — at 10^12-turn
        scale that's a full re-scan of freshly written parquet per
        coarse tier per run. The fused path instead keeps the finer
        slice persisted in memory and unions it with only the finer
        table's *pre-append* tail above the coarse HWM (the held-back
        incomplete-bucket rows from earlier runs, read as of the
        pre-commit snapshot), so one lineage flows scan -> 1min -> 1H
        -> 1D and storage is written, never re-read, within a run.
        Tier contents are identical either way (pinned by
        tests/test_pipeline_storage.py), so the knob is excluded from
        the config hash."""
        if fused is None:
            fused = self.fused_rollups
        results = []

        # --- 1min: directly from the fresh transcript slice ---------------
        t0 = time.time()
        fresh = self.ckpt.filter_new(
            transcripts, "rollup_1min", key_col="conv_id"
        ).persist()
        max_ts = fresh.agg(F.max(F.unix_micros("ts"))).first()[0]
        step_1min = parse_step("1min")
        t1min = rollup_transcripts(fresh, step_1min)
        if not finalize and max_ts is not None:
            boundary = (max_ts // step_1min.micros) * step_1min.micros
            t1min = t1min.where(F.unix_micros("ts") <= F.lit(boundary))
        # pre-append snapshot ids: the fused coarse tiers read the
        # finer table AS OF these, so this run's own append (already
        # in memory) is never re-read from disk
        pre_sids: dict[str, int | None] = {}
        if fused:
            snap = self.table("rollup_1min").current_snapshot()
            pre_sids["rollup_1min"] = snap.snapshot_id if snap else None
            t1min = t1min.persist()
        results.append(
            self._commit(
                "rollup_1min",
                t1min,
                t1min.select(F.col("conv_id"), F.col("ts")),
                "conv_id",
                t0,
                {"source": "transcripts"},
                keep_persisted=fused,
            )
        )
        fresh.unpersist()
        prev_new = t1min  # persisted iff fused

        # --- coarser tiers: incremental over the FULL finer tier table ----
        # A coarse bucket can span finer rows emitted by earlier runs, so
        # each coarse tier consumes the finer tier above its own HWM
        # (finer rows of un-emitted coarse buckets are exactly the rows
        # above it). Exact-duplicate finer rows from an at-least-once
        # replay are dropped before summing.
        for tier_step, source_name in (("1H", "rollup_1min"), ("1D", "rollup_1H")):
            t0 = time.time()
            stage = f"rollup_{tier_step}"
            step = parse_step(tier_step)
            if fused:
                # pre-append tail (held-back coarse buckets from
                # earlier runs) + this run's in-memory finer rows —
                # together exactly what the cascade's post-append read
                # returns, without re-scanning the fresh parquet
                tail = (
                    self.table(source_name).read(
                        self.spark,
                        as_of_snapshot=pre_sids[source_name],
                        min_ts_us=self.ckpt.global_min_hwm(stage),
                    )
                    if pre_sids[source_name] is not None
                    else None
                )
                finer = (
                    prev_new
                    if tail is None
                    else tail.unionByName(prev_new)
                )
            else:
                finer = self.table(source_name).read(
                    self.spark, min_ts_us=self.ckpt.global_min_hwm(stage)
                )
                if finer is None:
                    results.append(
                        StageResult(stage, 0, time.time() - t0, None)
                    )
                    continue
            finer_fresh = self.ckpt.filter_new(finer, stage, key_col="conv_id")
            finer_fresh = finer_fresh.dropDuplicates(["conv_id", "role", "ts"])
            tier = rollup_tier(finer_fresh, step)
            finer_max = finer_fresh.agg(F.max(F.unix_micros("ts"))).first()[0]
            if not finalize and finer_max is not None:
                boundary = (finer_max // step.micros) * step.micros
                tier = tier.where(F.unix_micros("ts") <= F.lit(boundary))
            if fused:
                snap = self.table(stage).current_snapshot()
                pre_sids[stage] = snap.snapshot_id if snap else None
                tier = tier.persist()
            results.append(
                self._commit(
                    stage,
                    tier,
                    tier.select(F.col("conv_id"), F.col("ts")),
                    "conv_id",
                    t0,
                    {"source": source_name},
                    keep_persisted=fused,
                )
            )
            if fused:
                prev_new.unpersist()
                prev_new = tier
        if fused:
            prev_new.unpersist()
        return results

    def run(
        self, transcripts: DataFrame, finalize: bool = True
    ) -> list[StageResult]:
        """Full DAG for one batch of uploads."""
        results = [self.run_checked(transcripts)]
        for i in range(len(self.cfg.aggregations)):
            results.append(self.run_agg_tier(i))
        for i in range(len(self.cfg.quantile_rollups)):
            results.append(self.run_quantile_tier(i, finalize=finalize))
        results.extend(self.run_rollups(transcripts, finalize=finalize))
        return results

    def apply_retention(self, policy, now_us: int) -> dict:
        """Enforce a per-tier retention ladder (e.g. checked: days,
        rollup_1min: weeks, rollup_1H: years, rollup_1D: forever) —
        day-granular chunk drops, see storage/retention.py. Recorded in
        the run log for lineage."""
        from .storage.retention import enforce

        results = enforce(self.root, policy, now_us)
        self.ckpt.record_run({"event": "retention", "results": results})
        return results
