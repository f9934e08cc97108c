"""Incremental (streaming) media feature extraction — the multimodal
plane's catch-up job, mirroring :mod:`.mentions`' availableNow pattern.

At 100 TB new media assets land continuously in the blob-store table;
this stage processes only the files that arrived since the last
checkpoint, runs the SAME batch operators (metadata probe + feature
extraction via :mod:`..operators.multimodal`) through foreachBatch, and
commits sink + checkpoint atomically — restart resumes exactly where it
left off, and streaming/batch semantics cannot diverge because the code
path is shared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import multimodal


def stream_media_features(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    dim: int = 8,
    fake_decode: bool = True,
    probe_metadata: bool = True,
) -> None:
    """availableNow streaming pass: parquet media files in ``input_dir``
    (MEDIA_SCHEMA) → per-asset feature rows appended to ``output_dir``.
    With ``probe_metadata`` the metadata backfill runs first, so the
    sink carries (feature vector ⊕ sniffed mime/dims) per asset."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        media = (
            multimodal.probe_media_metadata(batch_df)
            if probe_metadata
            else batch_df
        )
        if probe_metadata:
            # both the feature kernel and the metadata join consume the
            # probed frame — persist per batch so the decode probe runs
            # once, not twice
            media = media.persist()
        try:
            feats = multimodal.extract_media_features(
                media, dim=dim, fake_decode=fake_decode
            )
            out = feats
            if probe_metadata:
                out = feats.join(
                    # one metadata row per ref: a re-uploaded asset
                    # appearing twice in a batch must not multiply the
                    # join output (2 features x 2 metadata = 4 rows)
                    media.select("media_ref", "mime", "width", "height",
                                 "duration_ms").dropDuplicates(
                                     ["media_ref"]
                                 ),
                    on="media_ref",
                    how="left",
                )
            # batch_id stamp (mirrors streaming/mentions.py): parquet
            # append is NOT idempotent — a crash between write and
            # checkpoint commit replays the batch, and downstream
            # consumers dedup replayed rows by (media_ref, batch_id)
            out.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(output_dir)
        finally:
            if probe_metadata:
                media.unpersist()

    q = (
        spark.readStream.schema(multimodal.MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
