"""Driver-checkable queries for the library kernels (SURVEY §2 rows
T1/T2, D12/D13, P3/P4/P7, M1/M2/M3, N1/N2/N3/N6 + raster D1-D8,
D11/D15/D16).

Each family runs :mod:`..functions.fixture_cases` compute inside a
``mapInPandas`` over ``spark.range(n_cases)`` — distributed, Arrow-
batched, partitioning-independent — while the DuckDB oracle reads the
expected parquet written once by ``scripts/gen_kernel_fixtures.py``
from the SAME compute. pytest pins the kernels to reference
semantics; this gate pins the distributed plumbing to the kernels.

The net-backed families (dbnet/crnn/east) ship their seeded weights
to executors via ``SparkContext.broadcast`` — the reference's
weights-source pattern (S10: params file → every worker; here: one
driver-constructed weight dict → every executor, serialized once
instead of per task)."""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..functions import fixture_cases as fc

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "fixtures"
)

SCHEMAS = {
    "kernel_ctc_decode": "case_id bigint, text string, n_symbols bigint",
    "kernel_nms": (
        "case_id bigint, box_id bigint, c0 double, c1 double, c2 double, c3 double, "
        "c4 double, c5 double, c6 double, c7 double, score double, n_standard_kept bigint"
    ),
    "kernel_resize_plan": (
        "case_id bigint, h bigint, w bigint, det_h bigint, det_w bigint, rec_h bigint, "
        "rec_w bigint, recd_h bigint, recd_w bigint, rot_h bigint, rot_w bigint, rotated boolean"
    ),
    "kernel_det_metrics": (
        "case_id bigint, matched bigint, gt_care bigint, pred_care bigint, "
        "precision double, recall double, hmean double"
    ),
    "kernel_recog_metrics": "case_id bigint, precision double, recall double, hmean double, masked_acc double",
    "kernel_attention_decode": "case_id bigint, ids string, n_ids bigint",
    "kernel_dbnet_boxes": (
        "img_id bigint, box_id bigint, c0 bigint, c1 bigint, c2 bigint, c3 bigint, "
        "c4 bigint, c5 bigint, c6 bigint, c7 bigint, score double"
    ),
    "kernel_crnn_ctc": "img_id bigint, text string, logit_sum double",
    "kernel_east_boxes": (
        "img_id bigint, box_id bigint, c0 bigint, c1 bigint, c2 bigint, c3 bigint, "
        "c4 bigint, c5 bigint, c6 bigint, c7 bigint, cover double"
    ),
    "kernel_soft_nms": (
        "case_id bigint, box_id bigint, c0 double, c1 double, c2 double, c3 double, "
        "c4 double, c5 double, c6 double, c7 double, score double"
    ),
    "kernel_labelgen": (
        "case_id bigint, gt_pixels bigint, masked_out_pixels bigint, n_ignored bigint, "
        "geo_norm_sum double, geo_corner_sum double, border_mean double, border_mask_pixels bigint"
    ),
    "kernel_att_pipeline": "img_id bigint, ids string, enc_sum double, proj_sum double",
    "kernel_clrs_boxes": (
        "case_id bigint, box_id bigint, c0 double, c1 double, c2 double, c3 double, "
        "c4 double, c5 double, c6 double, c7 double"
    ),
    "kernel_bucket_batches": (
        "case_id bigint, batch_id bigint, pos bigint, item_id bigint, "
        "bucket_w bigint, bucket_len bigint"
    ),
    "kernel_random_crop": (
        "case_id bigint, crop_x bigint, crop_y bigint, crop_w bigint, crop_h bigint, "
        "scale double, n_polys_kept bigint, img_sum double"
    ),
    "kernel_media_decode": (
        "case_id bigint, fmt string, decoder string, n_bytes bigint, "
        "dim_a bigint, dim_b bigint, dim_c bigint, checksum bigint"
    ),
    "kernel_image_features": (
        "case_id bigint, decoder string, dhash bigint, gray_mean double, feat_sum double"
    ),
    "kernel_dbnet_mnv3": (
        "img_id bigint, box_id bigint, c0 bigint, c1 bigint, c2 bigint, c3 bigint, "
        "c4 bigint, c5 bigint, c6 bigint, c7 bigint, score double"
    ),
    "kernel_pixels": (
        "case_id bigint, src string, gray_sum bigint, g3_sum bigint, "
        "bgr_rt boolean, det_sum double, det_c0_mean double, rec_sum double"
    ),
    "kernel_audio_features": (
        "case_id bigint, n_frames bigint, duration_ms bigint, rms double, "
        "centroid_hz double, band_sum double"
    ),
    "kernel_webm_probe": (
        "case_id bigint, decoder string, width bigint, height bigint, "
        "sample_rate bigint, channels bigint, n_tracks bigint, n_frames bigint, n_bytes bigint"
    ),
    "kernel_crop_patch": (
        "case_id bigint, mode bigint, ph bigint, pw bigint, pix_sum bigint"
    ),
    "kernel_augment": (
        "case_id bigint, det_img_sum bigint, det_h bigint, det_w bigint, "
        "det_geom_op bigint, det_poly_digest double, rec_img_sum bigint, rec_ops string"
    ),
    "kernel_pdf_structs": (
        "case_id bigint, kind string, n_bytes bigint, n_lines bigint, text string"
    ),
    "kernel_compress_ratio": (
        "case_id bigint, kind bigint, n_raw_bytes bigint, n_deflate_bytes bigint, "
        "compress_ratio double"
    ),
    "kernel_pdf_images": (
        "case_id bigint, img_id bigint, page bigint, decoder string, "
        "width bigint, height bigint, channels bigint, pix_sum bigint"
    ),
    "kernel_pdf_layout": (
        "case_id bigint, line_id bigint, x double, y double, is_spanner boolean, text string"
    ),
    "kernel_pdf_extract": (
        "case_id bigint, variant string, n_bytes bigint, page bigint, line_id bigint, "
        "x double, y double, size double, text string, n_chars bigint"
    ),
    "kernel_bpe": (
        "case_id bigint, text string, n_pre_tokens bigint, n_tokens bigint, "
        "ids_digest bigint, ids_head string"
    ),
    "kernel_text2ids": (
        "case_id bigint, mode string, text string, text_len bigint, "
        "ids string, mask string, targ string"
    ),
    "kernel_vp8_frames": (
        "case_id bigint, pattern string, q_index bigint, width bigint, height bigint, "
        "n_bytes bigint, luma_digest bigint, max_err bigint, mean_err double"
    ),
    "kernel_pad_canvas": (
        "case_id bigint, layout string, in_h bigint, in_w bigint, canvas_h bigint, "
        "canvas_w bigint, out_dtype string, sum_preserved boolean, pix_digest bigint"
    ),
    "kernel_suffix_dedup": (
        "case_id bigint, doc_id bigint, t bigint, n_tokens bigint, n_kept bigint, "
        "lrs_len bigint, n_dup_starts bigint, sa_digest bigint, cleaned string"
    ),
    "kernel_losses": (
        "case_id bigint, dice double, mask_l1 double, balance_ce double, db double, "
        "east double, iou double, giou double, ciou double, ctc double"
    ),
}

_BROADCAST_NETS = {
    "kernel_dbnet_boxes": lambda: __import__(
        "gluon_ocr_spark.kernels.nets", fromlist=["DBNetNumpy"]
    ).DBNetNumpy(seed=7),
    "kernel_crnn_ctc": lambda: __import__(
        "gluon_ocr_spark.kernels.nets", fromlist=["CRNNNumpy"]
    ).CRNNNumpy(seed=11, voc_size=len(fc._VOCAB) + 1),
    "kernel_east_boxes": lambda: __import__(
        "gluon_ocr_spark.kernels.nets", fromlist=["EASTNumpy"]
    ).EASTNumpy(seed=13),
    "kernel_dbnet_mnv3": lambda: __import__(
        "gluon_ocr_spark.kernels.nets", fromlist=["DBNetNumpy"]
    ).DBNetNumpy(seed=7, backbone="mnv3"),
    "kernel_att_pipeline": lambda: __import__(
        "gluon_ocr_spark.kernels.nets", fromlist=["AttEncoderNumpy"]
    ).AttEncoderNumpy(seed=17),
}


def _make_query(family: str) -> Callable[[SparkSession, str], DataFrame]:
    compute, n_cases = fc.FAMILIES[family]
    schema = SCHEMAS[family]
    cols = [c.split()[0] for c in schema.split(", ")]
    net_factory = _BROADCAST_NETS.get(family)

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        bc = spark.sparkContext.broadcast(net_factory()) if net_factory else None

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            net = bc.value if bc is not None else None
            for b in batches:
                rows: list[dict] = []
                for i in b["id"]:
                    r = compute(int(i), net) if net is not None else compute(int(i))
                    rows.extend(r if isinstance(r, list) else [r])
                yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(columns=cols)

        base = spark.range(0, n_cases, 1, numPartitions=min(8, n_cases))
        return base.mapInPandas(gen, schema=schema)

    run.__name__ = f"query_{family}"
    return run


def kernel_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {family: _make_query(family) for family in fc.FAMILIES}


def kernel_oracles() -> dict[str, str]:
    return {
        family: f"SELECT * FROM '{os.path.join(FIXTURE_DIR, family)}.parquet'"
        for family in fc.FAMILIES
    }
