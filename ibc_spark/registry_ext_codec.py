"""Entropy-coded audio registry entries (round 11): the Rice/fixed-
predictor lossless codec (:mod:`ibc_spark.ext.audiocodec`) priced against
a DuckDB oracle that re-derives the exact compressed byte count from
first principles — the Rice bit-length is closed-form over the residual
stream, so the oracle computes the same residuals (order-2 second
differences over the synthesized waveform), the same zigzag map, the same
integer-exact Rice parameter, and the same byte accounting. A hash match
proves the encoder packed exactly the predicted bits; the lossless
round trip itself is verified sample-for-sample inside the Spark arm
(and property-tested over random waveforms in pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ibc_spark.ext import audiocodec, multimodal
from ibc_spark.io_.sources import read_table
from ibc_spark.registry_core import query
from ibc_spark.registry_ext_pipe import _AUDIO_SAMPLES_SQL


@query(
    "multimodal_audio_rice_codec",
    oracle=f"""
    WITH {_AUDIO_SAMPLES_SQL},
    lagged AS (
      SELECT doc_id, i, smp,
             lag(smp, 1) OVER (PARTITION BY doc_id ORDER BY i) AS p1,
             lag(smp, 2) OVER (PARTITION BY doc_id ORDER BY i) AS p2
      FROM s
    ),
    zz AS (
      SELECT doc_id,
             CASE WHEN (smp - 2*p1 + p2) >= 0 THEN 2*(smp - 2*p1 + p2)
                  ELSE -2*(smp - 2*p1 + p2) - 1 END AS u
      FROM lagged WHERE i > 2
    ),
    ks AS (
      SELECT doc_id, COUNT(*) AS nr, SUM(u) // COUNT(*) AS m
      FROM zz GROUP BY doc_id
    ),
    kk AS (
      SELECT ks.doc_id, ks.nr, CAST(COALESCE(MAX(t.j), 0) AS INT) AS k
      FROM ks LEFT JOIN range(0, 21) t(j) ON (ks.m >> t.j) >= 1
      GROUP BY ks.doc_id, ks.nr
    ),
    bits AS (
      SELECT z.doc_id, SUM(z.u >> kk.k) AS sq
      FROM zz z JOIN kk USING (doc_id) GROUP BY z.doc_id
    ),
    n_per AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
    per AS (
      SELECT d.doc_id,
             COALESCE(np.n, 0) AS n,
             LEAST(COALESCE(np.n, 0), 2) AS w,
             COALESCE(kk.k, 0) AS k,
             COALESCE(kk.nr, 0) AS nr,
             COALESCE(b.sq, 0) AS sq
      FROM documents d
      LEFT JOIN n_per np USING (doc_id)
      LEFT JOIN kk USING (doc_id)
      LEFT JOIN bits b USING (doc_id)
    ),
    sized AS (
      SELECT doc_id, n, k,
             CAST(2 * n AS BIGINT) AS raw_bytes,
             CAST(13 + 2 * w
                  + CASE WHEN nr > 0 THEN (sq + nr + 7) // 8 ELSE 0 END
                  + CASE WHEN nr > 0 AND k > 0 THEN (nr * k + 7) // 8
                         ELSE 0 END
               AS BIGINT) AS rice_bytes
      FROM per
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_samples,
           raw_bytes,
           rice_bytes,
           k,
           CASE WHEN raw_bytes > 0
                THEN rice_bytes * 1000 // raw_bytes END AS ratio_permille,
           -- attestation invariant (ADVICE r11): the Spark arm COMPUTES
           -- roundtrip_ok by decoding its own bitstream sample-for-sample
           -- (a false value breaks the hash); the oracle can assert TRUE
           -- because this entry always feeds attach_audio-synthesized
           -- WAVs, every one of which decodes. A corpus with undecodable
           -- payloads would mismatch by construction — Spark emits an
           -- all-NULL row for those — which is the desired loud failure.
           TRUE AS roundtrip_ok
    FROM sized
    """,
)
def multimodal_audio_rice_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossless entropy coding over the audio column: REAL WAV decode →
    order-2 fixed prediction → split-stream Golomb–Rice bit-packing →
    sample-exact round-trip verification → compression accounting. The
    oracle independently prices every payload's bitstream (header +
    warmup + unary + remainder bytes) from the closed-form Rice length
    over the same residuals, so the hash match certifies the actual
    packed bytes, not just the statistics. This closes the entropy-
    CODING half of the audio seam with a verifiable codec of our own;
    FLAC/MP3 *bitstream* decoding stays the documented audio-library
    seam (``ext/multimodal.py::decode_audio``) — no reference decoder
    exists in this sandbox to conformance-test a container port against.
    Narrow mapInPandas ×2 (attach, codec), no shuffle."""
    d = read_table(spark, sf_dir, "documents")
    return audiocodec.audio_rice_stats(multimodal.attach_audio(d))
