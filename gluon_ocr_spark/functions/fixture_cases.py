"""Deterministic kernel-parity cases: one generator + compute per
kernel family, shared by BOTH sides of the driver's correctness gate.

The Spark side runs ``compute_*`` inside mapInPandas over a
``spark.range(N_CASES)`` of case ids; the oracle side is a parquet of
the same rows written once by ``scripts/gen_kernel_fixtures.py`` (the
same compute, single-process) and read by DuckDB via
``SELECT … FROM '<path>'``. pytest pins the KERNELS to reference
semantics (hand-computed + reference-example values); these queries
prove the distributed execution reproduces the pinned kernels
bit-exactly under any partitioning.

Inputs derive from the case id alone (seeded ``np.random.Generator``)
so no input fixture file is needed and the two sides cannot drift.
Floats are rounded to 9 significant decimals before emission on both
sides (same code path), keeping the value-hash stable.
"""

from __future__ import annotations

import numpy as np

N_CASES = 48
N_IMAGES = 4

_VOCAB = list("abcdefghijklmnopqrstuvwxyz0123456789")  # 36 symbols, blank=36


def _rng(family: str, i: int) -> np.random.Generator:
    # md5-derived seed, NOT Python hash(): str hashing is salted per
    # process (PYTHONHASHSEED), which would desync executors vs oracle
    import hashlib

    digest = hashlib.md5(f"{family}:{int(i)}".encode()).hexdigest()
    return np.random.default_rng(int(digest[:15], 16))


def _r(x: float, nd: int = 9) -> float:
    return float(round(float(x), nd))


# -- T1/T2: CTC greedy decode ------------------------------------------------


def compute_ctc(i: int) -> dict:
    from ..kernels.ctc import ctc_collapse, ctc_greedy_decode

    rng = _rng("ctc", i)
    t = int(rng.integers(5, 40))
    blank = len(_VOCAB)
    # biased frames: blanks and repeats are common, like real logits
    frames = []
    prev = blank
    for _ in range(t):
        if rng.random() < 0.4:
            frames.append(blank)
            prev = blank
        elif rng.random() < 0.3 and prev != blank:
            frames.append(prev)
        else:
            prev = int(rng.integers(0, len(_VOCAB)))
            frames.append(prev)
    return {
        "case_id": int(i),
        "text": ctc_greedy_decode(frames, _VOCAB, blank=blank),
        "n_symbols": len(ctc_collapse(frames, blank)),
    }


# -- D12/D13: NMS ------------------------------------------------------------


def _nms_input(i: int) -> np.ndarray:
    rng = _rng("nms", i)
    k = int(rng.integers(3, 12))
    rows = []
    for _ in range(k):
        cx, cy = rng.uniform(20, 80, size=2)
        w, h = rng.uniform(8, 30, size=2)
        jitter = rng.uniform(-3, 3, size=8)
        quad = np.array([cx - w, cy - h, cx + w, cy - h, cx + w, cy + h, cx - w, cy + h]) + jitter
        rows.append(np.concatenate([quad, [rng.uniform(0.5, 1.0)]]))
    arr = np.array(rows)
    return arr[np.argsort(arr[:, 1])]  # row-scan order like EAST emits


def compute_nms(i: int) -> list[dict]:
    from ..kernels.geometry import locality_aware_nms, standard_nms

    arr = _nms_input(i)
    kept = locality_aware_nms(arr, thresh=0.3)
    std_kept = standard_nms(arr, thresh=0.3)
    out = []
    for j, row in enumerate(kept):
        out.append(
            {
                "case_id": int(i),
                "box_id": j,
                **{f"c{k}": _r(row[k]) for k in range(8)},
                "score": _r(row[8]),
                "n_standard_kept": len(std_kept),
            }
        )
    if not out:  # keep every case visible in the output
        out.append(
            {
                "case_id": int(i),
                "box_id": -1,
                **{f"c{k}": 0.0 for k in range(8)},
                "score": 0.0,
                "n_standard_kept": len(std_kept),
            }
        )
    return out


# -- P3/P4/P7: resize plans --------------------------------------------------


def compute_resize(i: int) -> dict:
    from ..kernels.resize import (
        det_resize_dims,
        recog_resize_dims,
        recog_resize_dims_divisor,
        rot90_if_tall,
    )

    rng = _rng("resize", i)
    h = int(rng.integers(8, 4000))
    w = int(rng.integers(8, 4000))
    dh, dw = det_resize_dims(h, w)
    rh, rw = recog_resize_dims(h, w)
    rdh, rdw = recog_resize_dims_divisor(h, w)
    th, tw, rot = rot90_if_tall(h, w)
    return {
        "case_id": int(i),
        "h": h,
        "w": w,
        "det_h": dh,
        "det_w": dw,
        "rec_h": rh,
        "rec_w": rw,
        "recd_h": rdh,
        "recd_w": rdw,
        "rot_h": th,
        "rot_w": tw,
        "rotated": bool(rot),
    }


# -- M1: detection IoU metrics ----------------------------------------------


def compute_det_metrics(i: int) -> dict:
    from ..kernels.metrics import detection_eval

    rng = _rng("detm", i)
    n_gt = int(rng.integers(1, 6))
    gts, ignores = [], []
    for _ in range(n_gt):
        x, y = rng.uniform(0, 80, size=2)
        w, h = rng.uniform(10, 30, size=2)
        gts.append([[x, y], [x + w, y], [x + w, y + h], [x, y + h]])
        ignores.append(bool(rng.random() < 0.2))
    preds = []
    for g in gts:
        if rng.random() < 0.7:  # detected with jitter
            j = rng.uniform(-2, 2, size=(4, 2))
            preds.append((np.array(g) + j).tolist())
    if rng.random() < 0.5:  # spurious detection
        x, y = rng.uniform(100, 150, size=2)
        preds.append([[x, y], [x + 10, y], [x + 10, y + 10], [x, y + 10]])
    res = detection_eval(gts, preds, ignore=ignores)
    return {
        "case_id": int(i),
        "matched": int(res["matched"]),
        "gt_care": int(res["gt_care"]),
        "pred_care": int(res["pred_care"]),
        "precision": _r(res["precision"]),
        "recall": _r(res["recall"]),
        "hmean": _r(res["hmean"]),
    }


# -- M2/M3: recognition metrics ----------------------------------------------


def compute_recog_metrics(i: int) -> dict:
    from ..kernels.metrics import recog_accuracy, recog_distance_eval

    rng = _rng("recm", i)
    n = int(rng.integers(1, 5))
    gt, pred = [], []
    for _ in range(n):
        L = int(rng.integers(3, 12))
        s = "".join(_VOCAB[int(v)] for v in rng.integers(0, len(_VOCAB), size=L))
        # corrupt a few chars for the pred twin
        p = list(s)
        for k in range(len(p)):
            if rng.random() < 0.15:
                p[k] = _VOCAB[int(rng.integers(0, len(_VOCAB)))]
        gt.append(s)
        pred.append("".join(p))
    m3 = recog_distance_eval(gt, pred)
    # M2 on padded id matrices (blank-free path: positional compare)
    seq = max(len(s) for s in gt)
    labels = np.full((n, seq), -1)
    preds_m = np.full((n, seq), -2)
    mask = np.zeros((n, seq))
    for r, (g, p) in enumerate(zip(gt, pred)):
        for c, ch in enumerate(g):
            labels[r, c] = _VOCAB.index(ch)
            mask[r, c] = 1
        for c, ch in enumerate(p[:seq]):
            preds_m[r, c] = _VOCAB.index(ch)
    acc = recog_accuracy(preds_m, labels, mask)
    return {
        "case_id": int(i),
        "precision": _r(m3["precision"]),
        "recall": _r(m3["recall"]),
        "hmean": _r(m3["hmean"]),
        "masked_acc": _r(acc),
    }


# -- N6: attention decoder ----------------------------------------------------


def compute_attention(i: int) -> dict:
    from ..kernels.attention import GreedyAttentionDecoder

    rng = _rng("attn", i)
    t = int(rng.integers(3, 20))
    states = rng.normal(size=(t, 32)).astype(np.float32)
    dec = GreedyAttentionDecoder(voc_size=len(_VOCAB) + 2, seed=7)
    ids = dec.decode(states, max_len=24)
    return {"case_id": int(i), "ids": "-".join(str(v) for v in ids), "n_ids": len(ids)}


# -- N1+D1-D8: DBNet forward + raster post-process ----------------------------


def _image(family: str, i: int, h: int = 64, w: int = 64) -> np.ndarray:
    """Synthetic 3×h×w 'page image': noise + a few bright rectangles
    (text-block analogs) so the detector heads see structure."""
    rng = _rng(family, i)
    img = rng.normal(0, 0.3, size=(1, 3, h, w))
    for _ in range(int(rng.integers(1, 4))):
        y0 = int(rng.integers(0, h - 16))
        x0 = int(rng.integers(0, w - 24))
        img[0, :, y0 : y0 + int(rng.integers(6, 14)), x0 : x0 + int(rng.integers(12, 24))] += 2.0
    return img


def compute_dbnet(i: int, weights_net=None) -> list[dict]:
    from ..kernels.nets import DBNetNumpy
    from ..kernels.raster import boxes_from_bitmap

    net = weights_net or DBNetNumpy(seed=7)
    img = _image("dbnet", i)
    out = net.forward(img)
    prob = out["thresh_binary"][0, 0]
    # seeded heads are untrained: binarize at the map median so the
    # post-process has blobs to box (the CONTRACT is determinism)
    thresh = float(np.median(prob))
    boxes, scores = boxes_from_bitmap(prob, 64, 64, thresh=thresh, box_thresh=0.0, min_area=20)
    rows = []
    for j, (b, s) in enumerate(zip(boxes, scores)):
        rows.append(
            {
                "img_id": int(i),
                "box_id": j,
                **{f"c{k}": int(v) for k, v in enumerate(b.reshape(8))},
                "score": _r(s),
            }
        )
    if not rows:
        rows.append({"img_id": int(i), "box_id": -1, **{f"c{k}": 0 for k in range(8)}, "score": 0.0})
    return rows


# -- N2+T1/T2: CRNN forward + CTC decode --------------------------------------


def compute_crnn(i: int, weights_net=None) -> dict:
    from ..kernels.ctc import ctc_greedy_decode
    from ..kernels.nets import CRNNNumpy

    net = weights_net or CRNNNumpy(seed=11, voc_size=len(_VOCAB) + 1)
    rng = _rng("crnn", i)
    img = rng.normal(size=(1, 3, 32, 64))
    logits = net.forward(img)[0]
    ids = np.argmax(logits, axis=-1).tolist()
    return {
        "img_id": int(i),
        "text": ctc_greedy_decode(ids, _VOCAB, blank=len(_VOCAB)),
        "logit_sum": _r(float(logits.sum()), 6),
    }


# -- N3+D11/D12/D15/D16: EAST forward + post-process ---------------------------


def compute_east(i: int, weights_net=None) -> list[dict]:
    from ..kernels.nets import EASTNumpy
    from ..kernels.raster import east_detect, sort_poly

    net = weights_net or EASTNumpy(seed=13)
    img = _image("east", i)
    score, geo = net.forward(img)
    sm = score[0, 0]
    thr = float(np.quantile(sm, 0.9))  # untrained head: top decile fires
    boxes = east_detect(sm, geo[0], score_thresh=thr, cover_thresh=0.0, nms_thresh=0.2)
    rows = []
    for j, b in enumerate(boxes):
        quad = sort_poly(b[:8].reshape(4, 2).astype(np.int64))
        rows.append(
            {
                "img_id": int(i),
                "box_id": j,
                **{f"c{k}": int(v) for k, v in enumerate(quad.reshape(8))},
                "cover": _r(b[8]),
            }
        )
    if not rows:
        rows.append({"img_id": int(i), "box_id": -1, **{f"c{k}": 0 for k in range(8)}, "cover": 0.0})
    return rows


# -- D14: soft-NMS -------------------------------------------------------------


def compute_soft_nms(i: int) -> list[dict]:
    from ..kernels.geometry import soft_nms

    arr = _nms_input(i)  # same candidate generator as kernel_nms
    kept = soft_nms(arr, threshold=0.4)
    out = []
    for j, row in enumerate(kept):
        out.append(
            {
                "case_id": int(i),
                "box_id": j,
                **{f"c{k}": _r(row[k]) for k in range(8)},
                "score": _r(row[8]),
            }
        )
    if not out:
        out.append({"case_id": int(i), "box_id": -1, **{f"c{k}": 0.0 for k in range(8)}, "score": 0.0})
    return out


# -- G1/G2: label generation ---------------------------------------------------


def compute_labelgen(i: int) -> dict:
    from ..kernels.labelgen import make_border_map, make_shrink_map

    rng = _rng("labelgen", i)
    h = w = 64
    polys, tags = [], []
    for _ in range(int(rng.integers(1, 4))):
        x0, y0 = rng.uniform(0, 40, size=2)
        pw, ph = rng.uniform(6, 28, size=2)
        polys.append(
            np.array([[x0, y0], [x0 + pw, y0], [x0 + pw, y0 + ph], [x0, y0 + ph]])
        )
        tags.append(bool(rng.random() < 0.2))
    shrink = make_shrink_map((h, w), polys, tags, gen_geometry=True)
    border = make_border_map((h, w), polys, shrink["ignore_tags"])
    return {
        "case_id": int(i),
        "gt_pixels": int(shrink["gt"].sum()),
        "masked_out_pixels": int((shrink["mask"] == 0).sum()),
        "n_ignored": int(sum(shrink["ignore_tags"])),
        "geo_norm_sum": _r(float(shrink["geo_map"][8].sum()), 6),
        # winding-SENSITIVE digest: channel-weighted so a (0,3,2,1)
        # corner permutation (channels 2/3 ↔ 6/7) changes the value —
        # catches an inverted winding test (ADVICE r2 high) that the
        # permutation-invariant fields miss.
        "geo_corner_sum": _r(
            float(sum((k + 1) * shrink["geo_map"][k].sum() for k in range(8))), 4
        ),
        "border_mean": _r(float(border["thresh_map"].mean()), 6),
        "border_mask_pixels": int(border["thresh_mask"].sum()),
    }


FAMILIES = {
    "kernel_ctc_decode": (compute_ctc, N_CASES),
    "kernel_nms": (compute_nms, N_CASES),
    "kernel_resize_plan": (compute_resize, N_CASES),
    "kernel_det_metrics": (compute_det_metrics, N_CASES),
    "kernel_recog_metrics": (compute_recog_metrics, N_CASES),
    "kernel_attention_decode": (compute_attention, N_CASES),
    "kernel_dbnet_boxes": (compute_dbnet, N_IMAGES),
    "kernel_crnn_ctc": (compute_crnn, N_IMAGES),
    "kernel_east_boxes": (compute_east, N_IMAGES),
    "kernel_soft_nms": (compute_soft_nms, N_CASES),
    "kernel_labelgen": (compute_labelgen, N_CASES),
}


def rows_for(family: str) -> list[dict]:
    """All expected rows for a family (oracle-side generation)."""
    fn, n = FAMILIES[family]
    rows: list[dict] = []
    for i in range(n):
        r = fn(i)
        rows.extend(r if isinstance(r, list) else [r])
    return rows


# -- N5+N6: attention encoder → greedy decoder pipeline ------------------------


def compute_att_pipeline(i: int, weights_net=None) -> dict:
    from ..kernels.attention import GreedyAttentionDecoder
    from ..kernels.nets import AttEncoderNumpy

    enc = weights_net or AttEncoderNumpy(seed=17)
    rng = _rng("attpipe", i)
    img = rng.normal(size=(1, 3, 32, 40))
    out, proj, mask = enc.forward(img)
    dec = GreedyAttentionDecoder(voc_size=len(_VOCAB) + 2, seed=7)
    ids = dec.decode(proj[0].astype(np.float32), max_len=24)
    return {
        "img_id": int(i),
        "ids": "-".join(str(v) for v in ids),
        "enc_sum": _r(float(out.sum()), 6),
        "proj_sum": _r(float(proj.sum()), 6),
    }


FAMILIES["kernel_att_pipeline"] = (compute_att_pipeline, N_IMAGES)


# -- D17: CLRS corner→box -------------------------------------------------------


def compute_clrs(i: int) -> list[dict]:
    from ..kernels.clrs import clrs_boxes

    rng = _rng("clrs", i)
    n_text = int(rng.integers(1, 3))
    ids_rows, box_rows = [], []
    seg = np.zeros((4, 64, 64))
    for _ in range(n_text):
        x0 = float(rng.integers(4, 20))
        y0 = float(rng.integers(4, 28))
        tw = float(rng.integers(24, 40))
        th = float(rng.integers(12, 24))
        x1, y1 = x0 + tw, y0 + th
        corners = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
        for k, (cx, cy) in enumerate(corners):
            jx, jy = rng.uniform(-1, 1, size=2)
            ids_rows.append([k])
            box_rows.append([cx - th / 2 + jx, cy - th / 2 + jy, cx + th / 2 + jx, cy + th / 2 + jy])
        mx, my = (x0 + x1) / 2, (y0 + y1) / 2
        seg[0, int(y0) : int(my), int(x0) : int(mx)] = 1
        seg[1, int(y0) : int(my), int(mx) : int(x1)] = 1
        seg[2, int(my) : int(y1), int(mx) : int(x1)] = 1
        seg[3, int(my) : int(y1), int(x0) : int(mx)] = 1
    out = clrs_boxes(np.array(ids_rows), np.array(box_rows), seg)
    rows = []
    for j, quad in enumerate(out):
        rows.append(
            {
                "case_id": int(i),
                "box_id": j,
                **{f"c{k}": _r(float(v)) for k, v in enumerate(quad.reshape(8))},
            }
        )
    if not rows:
        rows.append({"case_id": int(i), "box_id": -1, **{f"c{k}": 0.0 for k in range(8)}})
    return rows


FAMILIES["kernel_clrs_boxes"] = (compute_clrs, N_CASES)


# -- G5: bucketed batch plan ----------------------------------------------------


def compute_bucket_batches(i: int) -> list[dict]:
    from ..operators.bucketing import bucket_batches, bucket_key

    rng = _rng("bucket", i)
    n_items = int(rng.integers(8, 40))
    items = []
    for item_id in range(n_items):
        h = int(rng.integers(8, 64))
        w = int(rng.integers(8, 2048))
        L = int(rng.integers(0, 60))
        items.append((item_id, bucket_key(h, w, L)))
    batches = bucket_batches(items, batch_size=4, seed=int(i), last_batch="keep")
    rows = []
    for b_id, batch in enumerate(batches):
        for pos, item_id in enumerate(batch):
            key = dict(items)[item_id]
            rows.append(
                {
                    "case_id": int(i),
                    "batch_id": b_id,
                    "pos": pos,
                    "item_id": item_id,
                    "bucket_w": key[1],
                    "bucket_len": key[2],
                }
            )
    return rows


FAMILIES["kernel_bucket_batches"] = (compute_bucket_batches, N_CASES)


# -- G3: text-avoiding random crop ----------------------------------------------


def compute_random_crop(i: int) -> dict:
    from ..kernels.cropping import random_crop

    rng = _rng("crop", i)
    img = rng.normal(0.5, 0.1, size=(100, 100))
    polys, tags = [], []
    for _ in range(int(rng.integers(1, 4))):
        x0, y0 = rng.integers(5, 60, size=2)
        pw, ph = rng.integers(10, 30, size=2)
        polys.append(np.array([[x0, y0], [x0 + pw, y0], [x0 + pw, y0 + ph], [x0, y0 + ph]], float))
        tags.append(bool(rng.random() < 0.2))
    out = random_crop(img, polys, tags, np.random.default_rng(int(i)), size=(64, 64))
    cx, cy, cw, ch = out["crop"]
    return {
        "case_id": int(i),
        "crop_x": int(cx),
        "crop_y": int(cy),
        "crop_w": int(cw),
        "crop_h": int(ch),
        "scale": _r(out["scale"], 6),
        "n_polys_kept": len(out["polygons"]),
        "img_sum": _r(float(out["image"].sum()), 4),
    }


FAMILIES["kernel_random_crop"] = (compute_random_crop, N_CASES)


# -- multimodal: real stdlib codec round-trip ------------------------------------


def compute_media_decode(i: int) -> dict:
    from ..kernels.codecs import (
        decode_media,
        encode_bmp,
        encode_png,
        encode_ppm,
        encode_wav,
    )

    rng = _rng("media", i)
    fmt = (
        "png-rgb", "png-gray", "png-rgba", "bmp", "ppm",
        "wav", "jpeg", "jpeg-gray", "jpeg-prog", "jpeg-420", "gif",
    )[i % 11]
    if fmt == "wav":
        samples = (rng.normal(0, 9000, size=(int(rng.integers(50, 400)), 2))).astype(np.int16)
        payload = encode_wav(samples, rate=16000)
        meta = decode_media(payload)
        checksum = int(np.int64(meta["samples"]).sum())
        w, h, c = meta["sample_rate"], meta["channels"], meta["n_samples"]
    elif fmt.startswith("jpeg"):
        from ..kernels.jpeg import encode_jpeg, encode_jpeg_progressive

        hgt = int(rng.integers(4, 40))
        wid = int(rng.integers(4, 40))
        # smooth gradient + low noise: representative photographic
        # content (pure noise is the JPEG worst case, not the target)
        base = np.linspace(40, 210, wid)[None, :] + np.linspace(0, 30, hgt)[:, None]
        img = np.clip(base[:, :, None] + rng.normal(0, 6, size=(hgt, wid, 3)), 0, 255).astype(
            np.uint8
        )
        if fmt == "jpeg-prog":
            payload = encode_jpeg_progressive(img, quality=90)
        elif fmt == "jpeg-420":
            payload = encode_jpeg(img, quality=90, subsampling="420")
        else:
            payload = encode_jpeg(img if fmt == "jpeg" else img[:, :, 0], quality=90)
        meta = decode_media(payload)
        # lossy: checksum the DECODED pixels (deterministic float math)
        checksum = int(np.int64(meta["pixels"]).sum())
        w, h, c = meta["width"], meta["height"], meta["channels"]
    elif fmt == "gif":
        from ..kernels.gif import encode_gif

        hgt = int(rng.integers(4, 40))
        wid = int(rng.integers(4, 40))
        pal = rng.integers(0, 256, size=(int(rng.integers(2, 64)), 3)).astype(np.uint8)
        img = pal[rng.integers(0, len(pal), size=(hgt, wid))]
        payload = encode_gif(img)
        meta = decode_media(payload)
        assert np.array_equal(meta["pixels"], img)  # lossless
        checksum = int(np.int64(img).sum())
        w, h, c = meta["width"], meta["height"], meta["channels"]
    else:
        hgt = int(rng.integers(4, 40))
        wid = int(rng.integers(4, 40))
        ch = {"png-gray": 1, "png-rgba": 4}.get(fmt, 3)
        img = rng.integers(0, 256, size=(hgt, wid, ch)).astype(np.uint8)
        enc = {"bmp": encode_bmp, "ppm": encode_ppm}.get(fmt, encode_png)
        payload = enc(img if ch > 1 or fmt != "png-gray" else img[:, :, 0])
        meta = decode_media(payload)
        assert np.array_equal(meta["pixels"].reshape(img.shape), img)  # lossless
        checksum = int(np.int64(img).sum())
        w, h, c = meta["width"], meta["height"], meta["channels"]
    return {
        "case_id": int(i),
        "fmt": fmt,
        "decoder": meta["decoder"],
        "n_bytes": len(payload),
        "dim_a": int(w),
        "dim_b": int(h),
        "dim_c": int(c),
        "checksum": checksum,
    }


FAMILIES["kernel_media_decode"] = (compute_media_decode, N_CASES)


# -- multimodal feature extraction (decode → grayscale → resize → dHash) --------


def compute_image_features(i: int) -> dict:
    from ..kernels.codecs import decode_media, encode_bmp, encode_png
    from ..kernels.nets import bilinear_resize

    rng = _rng("imfeat", i)
    img = rng.integers(0, 256, size=(int(rng.integers(12, 48)), int(rng.integers(12, 48)), 3)).astype(
        np.uint8
    )
    if i % 3 == 2:
        from ..kernels.jpeg import encode_jpeg

        payload = encode_jpeg(img, quality=95)
    else:
        payload = encode_png(img) if i % 2 == 0 else encode_bmp(img)
    meta = decode_media(payload)
    gray = meta["pixels"][:, :, :3].mean(axis=2)
    grid = bilinear_resize(gray[None, None], 8, 9)[0, 0]
    bits = (grid[:, 1:] > grid[:, :-1]).reshape(-1)
    dhash = 0
    for b in bits:
        dhash = (dhash << 1) | int(b)
    feat = bilinear_resize(gray[None, None], 8, 8)[0, 0]
    return {
        "case_id": int(i),
        "decoder": meta["decoder"],
        "dhash": dhash - (1 << 63) if dhash >= (1 << 63) else dhash,
        "gray_mean": _r(float(gray.mean()), 6),
        "feat_sum": _r(float(feat.sum()), 6),
    }


FAMILIES["kernel_image_features"] = (compute_image_features, N_CASES)


# -- G7/G8/G9: loss kernels -------------------------------------------------------


def compute_losses(i: int) -> dict:
    from ..kernels.losses import (
        balance_ce_loss,
        box_iou_loss,
        ctc_loss,
        db_loss,
        dice_loss,
        east_loss,
        mask_l1_loss,
    )

    rng = _rng("loss", i)
    gt = (rng.random((1, 1, 8, 8)) > 0.7).astype(float)
    mask = np.ones((1, 1, 8, 8))
    binary = np.clip(rng.random((1, 1, 8, 8)), 0.01, 0.99)
    thresh = rng.random((1, 1, 8, 8))
    tb = np.clip(rng.random((1, 1, 8, 8)), 0.01, 0.99)
    tmap = rng.random((1, 1, 8, 8))
    tmask = (rng.random((1, 1, 8, 8)) > 0.5).astype(float)
    geo_gt9 = rng.random((1, 9, 8, 8))
    geo_pred = rng.random((1, 8, 8, 8))
    boxes_p = np.sort(rng.random((1, 4, 4)) * 50, axis=-1)
    boxes_t = np.sort(rng.random((1, 4, 4)) * 50, axis=-1)
    bm = np.ones((1, 4))
    t = int(rng.integers(4, 12))
    probs = rng.random((t, 5)) + 0.05
    lp = np.log(probs / probs.sum(axis=1, keepdims=True))
    labels = rng.integers(0, 4, size=int(rng.integers(1, min(t, 4)))).tolist()
    return {
        "case_id": int(i),
        "dice": _r(float(dice_loss(binary, gt, mask)[0])),
        "mask_l1": _r(float(mask_l1_loss(thresh, tmap, tmask)[0])),
        "balance_ce": _r(float(balance_ce_loss(binary, gt, mask)[0])),
        "db": _r(float(db_loss(binary, thresh, tb, gt, mask, tmap, tmask)[0])),
        "east": _r(float(east_loss(binary, gt, mask, geo_pred, geo_gt9)[0])),
        "iou": _r(float(box_iou_loss(boxes_p, boxes_t, bm, "iou")[0])),
        "giou": _r(float(box_iou_loss(boxes_p, boxes_t, bm, "giou")[0])),
        "ciou": _r(float(box_iou_loss(boxes_p, boxes_t, bm, "ciou")[0])),
        "ctc": _r(ctc_loss(lp, labels, blank=4)),
    }


FAMILIES["kernel_losses"] = (compute_losses, N_CASES)


# -- G4: seeded augmentation pipelines -----------------------------------------


def compute_augment(i: int) -> dict:
    from ..kernels.augment import augment_detect, augment_recog

    rng = _rng("augment", i)
    h, w = int(rng.integers(24, 48)), int(rng.integers(24, 48))
    img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    polys = []
    for _ in range(int(rng.integers(1, 4))):
        x0, y0 = rng.uniform(2, w * 0.5), rng.uniform(2, h * 0.5)
        pw, ph = rng.uniform(4, w * 0.4), rng.uniform(4, h * 0.4)
        polys.append(
            np.array([[x0, y0], [x0 + pw, y0], [x0 + pw, y0 + ph], [x0, y0 + ph]])
        )
    det_img, det_polys, det_applied = augment_detect(
        img, polys, np.random.default_rng(1000 + int(i))
    )
    rec_img, rec_applied = augment_recog(img, np.random.default_rng(2000 + int(i)))
    # poly digest: weighted coordinate sum is order- AND axis-sensitive
    pd = sum(
        float((p * [[1.0, 2.0]]).sum()) * (k + 1)
        for k, p in enumerate(det_polys)
    )
    return {
        "case_id": int(i),
        "det_img_sum": int(det_img.astype(np.int64).sum()),
        "det_h": int(det_img.shape[0]),
        "det_w": int(det_img.shape[1]),
        "det_geom_op": int(det_applied["geom_op"]),
        "det_poly_digest": _r(pd, 4),
        "rec_img_sum": int(rec_img.astype(np.int64).sum()),
        "rec_ops": ",".join(str(o) for o in rec_applied["ops"]),
    }


FAMILIES["kernel_augment"] = (compute_augment, N_CASES)


# -- N9: second backbone shape (MobileNetV3 inverted-residual) -------------------


def compute_dbnet_mnv3(i: int, weights_net=None) -> list[dict]:
    """kernel_dbnet_boxes' sibling with backbone='mnv3': same raster
    post-process, second backbone dataflow (expand/depthwise/SE)."""
    from ..kernels.nets import DBNetNumpy
    from ..kernels.raster import boxes_from_bitmap

    net = weights_net or DBNetNumpy(seed=7, backbone="mnv3")
    img = _image("dbnet", i)  # SAME inputs as the conv-backbone family
    out = net.forward(img)
    prob = out["thresh_binary"][0, 0]
    thresh = float(np.median(prob))
    # the seeded MNv3 FPN emits thin stripe blobs (~2px short side);
    # min_size=2 keeps them so every D1-D8 stage actually runs
    boxes, scores = boxes_from_bitmap(
        prob, 64, 64, thresh=thresh, box_thresh=0.0, min_size=2, min_area=20
    )
    rows = []
    for j, (b, s) in enumerate(zip(boxes, scores)):
        rows.append(
            {
                "img_id": int(i),
                "box_id": j,
                **{f"c{k}": int(v) for k, v in enumerate(b.reshape(8))},
                "score": _r(s),
            }
        )
    if not rows:
        rows.append({"img_id": int(i), "box_id": -1, **{f"c{k}": 0 for k in range(8)}, "score": 0.0})
    return rows


FAMILIES["kernel_dbnet_mnv3"] = (compute_dbnet_mnv3, N_IMAGES)


# -- P1/P2/P5: real pixel preprocessing ------------------------------------------


def compute_pixels(i: int) -> dict:
    from ..kernels.codecs import decode_media, encode_png
    from ..kernels.jpeg import encode_jpeg
    from ..kernels.pixels import (
        bgr_to_rgb,
        gray_to_3ch,
        preprocess_detect,
        preprocess_recog,
        rgb_to_gray,
    )

    rng = _rng("pixels", i)
    h, w = int(rng.integers(10, 40)), int(rng.integers(10, 40))
    base = np.linspace(20, 230, w)[None, :] + np.linspace(0, 25, h)[:, None]
    img = np.clip(base[:, :, None] + rng.normal(0, 7, (h, w, 3)), 0, 255).astype(np.uint8)
    payload = encode_png(img) if i % 2 == 0 else encode_jpeg(img, quality=92)
    pixels = decode_media(payload)["pixels"]
    det = preprocess_detect(pixels)
    rec = preprocess_recog(pixels)
    gray = rgb_to_gray(pixels)
    return {
        "case_id": int(i),
        "src": "png" if i % 2 == 0 else "jpeg",
        "gray_sum": int(np.int64(gray).sum()),
        "g3_sum": int(np.int64(gray_to_3ch(gray)).sum()),
        "bgr_rt": bool(np.array_equal(bgr_to_rgb(bgr_to_rgb(pixels)), pixels)),
        "det_sum": _r(float(det.sum()), 4),
        "det_c0_mean": _r(float(det[0].mean()), 6),
        "rec_sum": _r(float(rec.sum()), 4),
    }


FAMILIES["kernel_pixels"] = (compute_pixels, N_CASES)


# -- multimodal audio features ---------------------------------------------------


def compute_audio_features(i: int) -> dict:
    from ..kernels.audio import audio_features
    from ..kernels.codecs import decode_wav, encode_wav

    rng = _rng("audio", i)
    rate = 16000
    n = int(rng.integers(1200, 8000))
    t = np.arange(n) / rate
    f0 = float(rng.uniform(80, 3000))
    sig = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.1 * rng.normal(size=n)
    samples = np.clip(sig * 12000, -32768, 32767).astype(np.int16)
    stereo = np.stack([samples, (samples * 0.5).astype(np.int16)], axis=1)
    rate2, decoded = decode_wav(encode_wav(stereo, rate))
    f = audio_features(decoded, rate2)
    return {
        "case_id": int(i),
        "n_frames": f["n_frames"],
        "duration_ms": int(round(f["duration_s"] * 1000)),
        "rms": _r(f["rms"], 8),
        "centroid_hz": _r(f["centroid_hz"], 4),
        "band_sum": _r(float(sum(f["band_log_energy"])), 6),
    }


FAMILIES["kernel_audio_features"] = (compute_audio_features, N_CASES)


# -- WebM EBML metadata probe ----------------------------------------------------


def compute_webm_probe(i: int) -> dict:
    from ..kernels.codecs import decode_media, encode_webm_probe_fixture

    rng = _rng("webm", i)
    w = int(rng.integers(16, 4096))
    h = int(rng.integers(16, 2160))
    has_audio = bool(i % 2)
    sr = int(rng.choice([16000, 44100, 48000])) if has_audio else 0
    ch = int(rng.integers(1, 3)) if has_audio else 0
    nf = int(rng.integers(0, 90))
    payload = encode_webm_probe_fixture(w, h, sr, ch, n_frames=nf)
    meta = decode_media(payload)
    return {
        "case_id": int(i),
        "decoder": meta["decoder"],
        "width": int(meta["width"]),
        "height": int(meta["height"]),
        "sample_rate": int(meta["sample_rate"]),
        "channels": int(meta["channels"]),
        "n_tracks": int(meta["n_tracks"]),
        "n_frames": int(meta["n_frames"]),
        "n_bytes": len(payload),
    }


FAMILIES["kernel_webm_probe"] = (compute_webm_probe, N_CASES)


# -- C1 pixel form: perspective-warp line cropping -------------------------------


def compute_crop_patch(i: int) -> dict:
    from ..kernels.warp import crop_patch

    rng = _rng("croppatch", i)
    h, w = int(rng.integers(40, 80)), int(rng.integers(40, 80))
    base = np.linspace(10, 240, w)[None, :] + np.linspace(0, 30, h)[:, None]
    img = np.clip(base[:, :, None] + rng.normal(0, 5, (h, w, 3)), 0, 255).astype(np.uint8)
    mode = i % 3
    if mode == 0:  # axis-aligned fast path
        x0, y0 = int(rng.integers(0, w // 2)), int(rng.integers(0, h // 2))
        bw, bh = int(rng.integers(8, w // 2)), int(rng.integers(6, h // 2))
        box = [[x0, y0], [x0 + bw, y0], [x0 + bw, y0 + bh], [x0, y0 + bh]]
    elif mode == 1:  # rotated quad
        ang = float(rng.uniform(-0.6, 0.6))
        c, s = np.cos(ang), np.sin(ang)
        bw, bh = float(rng.uniform(14, 30)), float(rng.uniform(8, 16))
        cx, cy = w / 2.0, h / 2.0
        rect = np.array([[-bw / 2, -bh / 2], [bw / 2, -bh / 2], [bw / 2, bh / 2], [-bw / 2, bh / 2]])
        box = (rect @ np.array([[c, -s], [s, c]]).T + [cx, cy]).tolist()
    else:  # >4 points → min-rect reduction path
        pts = rng.uniform([8, 8], [w - 8, h - 8], size=(int(rng.integers(5, 9)), 2))
        box = pts.tolist()
    patch = crop_patch(img, box)
    return {
        "case_id": int(i),
        "mode": mode,
        "ph": int(patch.shape[0]),
        "pw": int(patch.shape[1]),
        "pix_sum": int(np.int64(patch).sum()),
    }


FAMILIES["kernel_crop_patch"] = (compute_crop_patch, N_CASES)


# -- PDF leg: text extraction through a real PDF byte stream --------------------

_PDF_WORDS = [
    "spark", "shuffle", "filter", "join", "window", "batch", "stream",
    "(paren)", "back\\slash", "q.e.d", "a+b=c", "k-means", "100%",
]
_PDF_UNI_WORDS = ["héllo", "wörld", "中文文本", "тест", "naïve", "—dash—", "αβγ"]


def compute_pdf_extract(i: int) -> list[dict]:
    """Round-trip deterministic text through :func:`encode_pdf` →
    :func:`pdf_text_lines`, exercising every parser surface on a cycle:
    content-op variants (Td/Tm/TJ-kern/'/hex), Flate on/off, classic
    xref vs xref streams (± PNG predictor), ObjStm packing, and the
    Type0/Identity-H + ToUnicode unicode path. The compute asserts the
    text round-trips exactly, then emits the parsed line geometry —
    so the driver gate pins BOTH the byte-level codec and the reading-
    order assembly under distributed execution."""
    from ..kernels.pdf import encode_pdf, pdf_text_lines

    rng = _rng("pdf", i)
    variant_kw = [
        {"variant": "td"},
        {"variant": "td", "compress": False, "explicit_widths": True},
        {"variant": "tm"},
        {"variant": "tjarr"},
        {"variant": "td", "hex_strings": True},
        {"variant": "quote"},
        {"variant": "tm", "xref_stream": True},
        {"variant": "td", "xref_stream": True, "objstm": True, "predictor": True},
        {"variant": "td", "unicode_font": True},
        {"variant": "tjarr", "unicode_font": True, "xref_stream": True, "objstm": True},
    ][i % 10]
    words = _PDF_UNI_WORDS if variant_kw.get("unicode_font") else _PDF_WORDS
    n_pages = 1 + (1 if i % 3 == 0 else 0)
    pages: list[list[tuple[float, float, float, str]]] = []
    expected: list[str] = []
    for _p in range(n_pages):
        n_lines = int(rng.integers(2, 6))
        size = float([8, 10, 12][int(rng.integers(0, 3))])
        x = 72.0 + float(int(rng.integers(0, 4)) * 10)
        runs = []
        for k in range(n_lines):
            text = " ".join(
                words[int(j)] for j in rng.integers(0, len(words), size=int(rng.integers(2, 6)))
            )
            runs.append((x, 700.0 - 20.0 * k, size, text))
            expected.append(text)
        pages.append(runs)
    payload = encode_pdf(pages, **variant_kw)
    lines = pdf_text_lines(payload)
    got = "\n".join(ln.text for ln in lines)
    if got != "\n".join(expected):
        raise AssertionError(f"pdf roundtrip drift (case {i}): {got!r}")
    variant_tag = "+".join(
        [variant_kw["variant"]]
        + sorted(k for k, v in variant_kw.items() if k != "variant" and v)
    )
    return [
        {
            "case_id": int(i),
            "variant": variant_tag,
            "n_bytes": len(payload),
            "page": int(ln.page),
            "line_id": int(k),
            "x": _r(ln.x, 6),
            "y": _r(ln.y, 6),
            "size": _r(ln.size, 6),
            "text": ln.text,
            "n_chars": len(ln.text),
        }
        for k, ln in enumerate(lines)
    ]


FAMILIES["kernel_pdf_extract"] = (compute_pdf_extract, N_CASES)


def compute_pdf_layout(i: int) -> list[dict]:
    """Column-aware reading order (the layout half of the PDF leg):
    synthesize a two-column page — optional full-width title, two
    columns of short lines, optional mid-page full-width divider —
    and emit the extracted lines in reading order with a column tag
    derived from geometry. The expected order (title → col1 → col2 →
    divider → lower section) is asserted inside the compute, so the
    driver gate pins the XY-cut banding, the gutter split, and the
    spanner sectioning under distributed execution."""
    from ..kernels.pdf import encode_pdf, pdf_text_lines

    rng = _rng("pdflayout", i)
    size = 10.0
    has_title = i % 2 == 0
    has_divider = i % 3 == 0
    col_x = (72.0, 340.0)
    n1, n2 = int(rng.integers(2, 5)), int(rng.integers(2, 5))
    mk = lambda tag, k: f"{tag} line {k} " + "".join(  # noqa: E731
        _PDF_WORDS[int(j)] for j in rng.integers(0, 7, size=1)
    )
    runs: list[tuple[float, float, float, str]] = []
    expected: list[str] = []
    title = "Wide Title Spanning Both Columns Of The Synthetic Page " + str(i)
    if has_title:
        runs.append((72.0, 720.0, size, title))
    col1 = [mk("left", k) for k in range(n1)]
    col2 = [mk("right", k) for k in range(n2)]
    for k, t in enumerate(col1):
        runs.append((col_x[0], 680.0 - 20.0 * k, size, t))
    for k, t in enumerate(col2):
        runs.append((col_x[1], 680.0 - 20.0 * k, size, t))
    lower: list[str] = []
    divider = "A Mid Page Divider Also Spanning The Full Content Width " + str(i)
    if has_divider:
        runs.append((72.0, 560.0, size, divider))
        lower = [mk("lowleft", 0)]
        runs.append((col_x[0], 520.0, size, lower[0]))
        lower.append(mk("lowright", 0))
        runs.append((col_x[1], 520.0, size, lower[1]))
    if has_title:
        expected.append(title)
    expected += col1 + col2
    if has_divider:
        expected += [divider] + lower
    # runs are shuffled before encoding: reading order must come from
    # geometry, never from content-stream emission order
    perm = rng.permutation(len(runs))
    payload = encode_pdf([[runs[int(p)] for p in perm]])
    lines = pdf_text_lines(payload)
    if [ln.text for ln in lines] != expected:
        raise AssertionError(f"pdf layout order drift (case {i}): {[ln.text for ln in lines]!r}")
    return [
        {
            "case_id": int(i),
            "line_id": int(k),
            "x": _r(ln.x, 6),
            "y": _r(ln.y, 6),
            "is_spanner": bool(ln.x_end - ln.x > 0.55 * 336.0),
            "text": ln.text,
        }
        for k, ln in enumerate(lines)
    ]


FAMILIES["kernel_pdf_layout"] = (compute_pdf_layout, N_CASES)


def compute_pdf_images(i: int) -> list[dict]:
    """Embedded-image extraction from PDFs — the multimodal crawl-PDF
    op: JPEG (DCTDecode → the from-scratch JPEG decoder) and raw
    Flate rasters (RGB + gray) embedded per page, extracted back and
    checksummed. Raw images assert losslessness inside the compute;
    JPEG checksums the deterministically decoded pixels (same
    convention as kernel_media_decode)."""
    from ..kernels.jpeg import encode_jpeg
    from ..kernels.pdf import encode_pdf, pdf_images

    rng = _rng("pdfimg", i)
    h = int(rng.integers(8, 28))
    w = int(rng.integers(8, 28))
    base = np.linspace(40, 210, w)[None, :] + np.linspace(0, 30, h)[:, None]
    photo = np.clip(base[:, :, None] + rng.normal(0, 6, (h, w, 3)), 0, 255).astype(np.uint8)
    jpg = encode_jpeg(photo, quality=90)
    raw_rgb = rng.integers(0, 256, (int(rng.integers(6, 20)), int(rng.integers(6, 20)), 3)).astype(np.uint8)
    raw_gray = rng.integers(0, 256, (int(rng.integers(6, 20)), int(rng.integers(6, 20)))).astype(np.uint8)
    structure = {} if i % 3 else {"xref_stream": True, "objstm": True}
    payload = encode_pdf(
        [[(72.0, 700.0, 10.0, f"figure page {i}")], [(72.0, 700.0, 10.0, "plates")]],
        images={0: [("jpeg", jpg, w, h), ("raw", raw_rgb)], 1: [("raw", raw_gray)]},
        **structure,
    )
    ims = pdf_images(payload)
    if len(ims) != 3:
        raise AssertionError(f"pdf image inventory drift (case {i}): {len(ims)}")
    if not np.array_equal(ims[1]["pixels"].reshape(raw_rgb.shape), raw_rgb):
        raise AssertionError(f"raw rgb roundtrip drift (case {i})")
    if not np.array_equal(ims[2]["pixels"].reshape(raw_gray.shape + (1,)), raw_gray[:, :, None]):
        raise AssertionError(f"raw gray roundtrip drift (case {i})")
    return [
        {
            "case_id": int(i),
            "img_id": int(k),
            "page": int(im["page"]),
            "decoder": im["decoder"],
            "width": int(im["width"]),
            "height": int(im["height"]),
            "channels": int(im["channels"]),
            "pix_sum": int(np.int64(im["pixels"]).sum()),
        }
        for k, im in enumerate(ims)
    ]


FAMILIES["kernel_pdf_images"] = (compute_pdf_images, N_CASES)


def compute_compress_ratio(i: int) -> dict:
    """Deflate compression-ratio quality signal over synthesized docs
    spanning the redundancy spectrum: highly repeated tokens (low
    ratio), natural-ish word mixes, and alphanumeric noise (ratio ≈ or
    > 1). Uses the SAME compress_stats the Spark operator applies, so
    the gate pins the distributed zlib execution byte-for-byte."""
    from ..operators.textstats import compress_stats

    rng = _rng("compress", i)
    kind = i % 3
    if kind == 0:  # templated/repetitive
        word = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, size=int(rng.integers(3, 8))))
        text = " ".join([word] * int(rng.integers(20, 120)))
    elif kind == 1:  # mixed prose-like
        vocab = ["spark", "filter", "join", "window", "the", "of", "stream", "batch"]
        text = " ".join(vocab[int(j)] for j in rng.integers(0, len(vocab), size=int(rng.integers(30, 150))))
    else:  # incompressible noise
        text = "".join(chr(33 + int(c)) for c in rng.integers(0, 90, size=int(rng.integers(50, 300))))
    raw, comp, ratio = compress_stats(text)
    return {
        "case_id": int(i),
        "kind": kind,
        "n_raw_bytes": raw,
        "n_deflate_bytes": comp,
        "compress_ratio": ratio,
    }


FAMILIES["kernel_compress_ratio"] = (compute_compress_ratio, N_CASES)


def compute_pdf_structs(i: int) -> dict:
    """Driver-gate coverage for the PDF parser's HARDENING paths that
    the encoder never emits on its own — built here by deterministic
    byte surgery on encoder output, exactly like the unit tests:

    * ``rot``: /Rotate spliced into the page dict (90/180/270) —
      reading order must follow the DISPLAYED orientation;
    * ``incr``: an incremental update appending a revised content
      object + a second xref with /Prev — the newer object wins;
    * ``scan``: corrupted startxref offset — the brute-force object
      scan must still recover the document;
    * ``badlen``: /Length lies — the endstream search fallback.
    """
    from ..kernels.pdf import encode_pdf, pdf_text_lines

    rng = _rng("pdfstruct", i)
    kind = ("rot90", "rot180", "rot270", "incr", "scan", "badlen")[i % 6]
    lines = [
        " ".join(
            _PDF_WORDS[int(j)] for j in rng.integers(0, len(_PDF_WORDS), size=int(rng.integers(2, 5)))
        )
        for _ in range(int(rng.integers(2, 5)))
    ]
    expected = list(lines)
    if kind in ("rot90", "rot270"):
        # sideways-drawn text (rotated Tm) + the matching /Rotate:
        # the displayed page reads upright. Lines sit at distinct
        # user-space x (vertical baselines); under /Rotate they map
        # to distinct display baselines in k order.
        if kind == "rot90":
            runs = [(72.0 + 20.0 * k, 72.0, 10.0, t) for k, t in enumerate(lines)]
            mat = b"0 1 -1 0 "
        else:
            runs = [(300.0 - 20.0 * k, 72.0, 10.0, t) for k, t in enumerate(lines)]
            mat = b"0 -1 1 0 "
        base = encode_pdf([runs], compress=False, variant="tm")
        payload = base.replace(b"1 0 0 1 ", mat).replace(
            b"<< /Type /Page ", b"<< /Type /Page /Rotate " + kind[3:].encode() + b" ", 1
        )
    else:
        base = encode_pdf(
            [[(72.0, 700.0 - 20.0 * k, 10.0, t) for k, t in enumerate(lines)]], compress=False
        )
    if kind in ("rot90", "rot270"):
        pass  # payload built above
    elif kind == "rot180":
        payload = base.replace(
            b"<< /Type /Page ", b"<< /Type /Page /Rotate 180 ", 1
        )
        expected = expected[::-1]
    elif kind == "incr":
        # the encoder writes content streams first: a one-page doc's
        # content is object 1 (searching by text bytes would miss when
        # the line begins with an escaped character)
        objnum = 1
        new_text = "revised final line " + str(i)
        stream = ("BT /F1 10 Tf 72 640 Td (" + new_text + ") Tj ET").encode()
        body = (
            f"{objnum} 0 obj\n<< /Length {len(stream)} >>\nstream\n".encode()
            + stream + b"\nendstream\nendobj\n"
        )
        old_xref = base.rfind(b"\nxref\n") + 1  # NOT rfind(b"xref"): that hits "startxref"
        root_at = base.find(b"/Root ") + 6
        root_num = int(base[root_at : base.find(b" ", root_at)])
        updated = base + body
        payload = updated + (
            b"xref\n0 1\n0000000000 65535 f \n"
            + f"{objnum} 1\n{len(base):010d} 00000 n \n".encode()
            + b"trailer\n<< /Size 99 /Root " + str(root_num).encode()
            + b" 0 R /Prev " + str(old_xref).encode() + b" >>\nstartxref\n"
            + str(len(updated)).encode() + b"\n%%EOF\n"
        )
        # the revised object replaces the whole page's content stream
        expected = [new_text]
    elif kind == "scan":
        at = base.rfind(b"startxref")
        payload = base[:at] + b"startxref\n999999999\n%%EOF\n"
    else:  # badlen
        at = base.find(b"/Length ")
        end = at + 8
        while chr(base[end]).isdigit():
            end += 1
        payload = base[:at] + b"/Length 999999" + base[end:]
    got = [ln.text for ln in pdf_text_lines(payload)]
    if got != expected:
        raise AssertionError(f"pdf struct path drift (case {i}, {kind}): {got!r}")
    return {
        "case_id": int(i),
        "kind": kind,
        "n_bytes": len(payload),
        "n_lines": len(got),
        "text": "\n".join(got),
    }


FAMILIES["kernel_pdf_structs"] = (compute_pdf_structs, N_CASES)


# -- BPE merge tokenizer (token counting — the training-data currency) --------


def compute_bpe(i: int) -> dict:
    """Real BPE merge-loop encoding (kernels/bpe.py) over texts that
    exercise every pre-token class: in-vocab words (merge down to few
    symbols), out-of-vocab words (stay byte-ish), contractions,
    digit runs, punctuation runs, and unicode (multi-byte UTF-8).
    Pins: pre-token count vs merged count, the id stream digest, and
    losslessness (decode == text, asserted here so a broken merge
    loop can't silently ship a fixture)."""
    from ..kernels.bpe import (
        decode,
        default_ranks,
        default_vocab,
        encode,
        encode_ids,
        pre_tokenize,
    )

    rng = _rng("bpe", i)
    invocab = ["the", "extraction", "pipeline", "shuffle", "token", "corpus",
               "document", "quality", "partition", "stream"]
    novel = ["zyxwv", "qqqj", "blorp", "kxv", "snarfle"]
    parts: list[str] = []
    for k in range(int(rng.integers(4, 12))):
        r = rng.random()
        if r < 0.45:
            parts.append(invocab[int(rng.integers(0, len(invocab)))])
        elif r < 0.65:
            parts.append(novel[int(rng.integers(0, len(novel)))])
        elif r < 0.8:
            parts.append(str(int(rng.integers(0, 99999))))
        else:
            parts.append(invocab[int(rng.integers(0, len(invocab)))] + "'s")
    text = " ".join(parts)
    if i % 4 == 1:
        text += ", doesn't it?"
    if i % 4 == 2:
        text += " — naïve café 中文"
    if i % 4 == 3:
        text = text.upper()

    ranks, vocab = default_ranks(), default_vocab()
    syms = encode(text, ranks)
    if decode(syms) != text:
        raise AssertionError(f"bpe roundtrip broken (case {i})")
    ids = encode_ids(text, ranks, vocab)
    digest = 0
    for tid in ids:
        digest = (digest * 1000003 + tid) % 2147483647
    return {
        "case_id": int(i),
        "text": text,
        "n_pre_tokens": len(pre_tokenize(text)),
        "n_tokens": len(ids),
        "ids_digest": digest,
        "ids_head": ",".join(str(t) for t in ids[:16]),
    }


FAMILIES["kernel_bpe"] = (compute_bpe, N_CASES)


# -- vp8i intra frames (real entropy-coded WebM frame decode) -----------------


def compute_vp8_frames(i: int) -> dict:
    """vp8i key-frame encode → WebM mux → container-walk decode →
    luma digest: the full frame-level media path (kernels/vp8.py +
    codecs.webm_vp8i_frames). Patterns span the prediction modes
    (flat → DC, vertical/horizontal edges → V/H, gradients → TM,
    noise → residual-heavy); the reconstruction-error bound vs the
    quantizer step is asserted HERE so a broken transform or coder
    can't silently ship a fixture."""
    from ..kernels.codecs import encode_webm_probe_fixture, webm_vp8i_frames
    from ..kernels.vp8 import encode_frame, quant_for_index

    rng = _rng("vp8", i)
    h = int(rng.integers(2, 5)) * 16
    w = int(rng.integers(2, 6)) * 16
    yy, xx = np.mgrid[0:h, 0:w]
    kind = i % 5
    if kind == 0:
        pattern = "flat"
        y = np.full((h, w), int(rng.integers(30, 220)))
    elif kind == 1:
        pattern = "vstripes"
        y = ((xx // 8) % 2) * 180 + 30
    elif kind == 2:
        pattern = "hstripes"
        y = ((yy // 8) % 2) * 180 + 30
    elif kind == 3:
        pattern = "gradient"
        y = 32 + xx * 2 + yy
    else:
        pattern = "noise"
        y = rng.integers(0, 256, (h, w))
    y = np.clip(y, 0, 255).astype(np.uint8)
    u = np.clip(90 + (xx[::2, ::2] // 4), 0, 255).astype(np.uint8)
    v = np.clip(70 + (yy[::2, ::2] // 4), 0, 255).astype(np.uint8)
    q = int(rng.integers(0, 48))

    frame = encode_frame(y, u, v, q_index=q)
    webm = encode_webm_probe_fixture(w, h, frame_payloads=[frame])
    decoded = webm_vp8i_frames(webm)
    assert len(decoded) == 1 and decoded[0]["decoded"], f"vp8i decode failed (case {i})"
    f = decoded[0]
    assert f["width"] == w and f["height"] == h and f["q_index"] == q

    # reconstruction bound: prediction residual error is bounded by
    # the dequant step (plus idct rounding); re-decode for the pixels
    from ..kernels.vp8 import decode_frame

    rec = decode_frame(frame)
    err = np.abs(rec["y"].astype(np.int64) - y.astype(np.int64))
    dc_q, ac_q = quant_for_index(q)
    bound = ac_q * 2 + 8
    assert int(err.max()) <= bound, f"recon err {err.max()} > bound {bound} (case {i})"

    return {
        "case_id": int(i),
        "pattern": pattern,
        "q_index": q,
        "width": w,
        "height": h,
        "n_bytes": int(f["n_bytes"]),
        "luma_digest": int(f["luma_digest"]),
        "max_err": int(err.max()),
        "mean_err": _r(float(err.mean()), 4),
    }


FAMILIES["kernel_vp8_frames"] = (compute_vp8_frames, N_CASES)


# -- T4: text2ids / teacher-forcing target shift ------------------------------


def compute_text2ids(i: int) -> dict:
    """T4 vocabulary mapping + target shift pinned to the reference's
    exact semantics (recog_dataset.py:74-87,145-148): pad-initialized
    ids, '</s>' appended in symbol mode, OOV chars leave a pad hole
    with mask 0 (position consumed), teacher-forcing input =
    [<s>] + label[:-1]."""
    from ..kernels.ctc import IC15_VOCAB, build_word2id, shift_targets, text2ids

    rng = _rng("text2ids", i)
    symbol_mode = i % 2 == 0
    w2i, pad, add = (
        build_word2id(IC15_VOCAB, 0, 1) if symbol_mode else build_word2id(IC15_VOCAB)
    )
    alphabet = IC15_VOCAB + ["!", "?", "Z", " "]  # OOV chars mixed in
    n = int(rng.integers(1, 12))
    text = "".join(alphabet[int(j)] for j in rng.integers(0, len(alphabet), size=n))
    text_len = int(rng.integers(max(1, n - 2), n + 4))
    ids, mask = text2ids(text, text_len, w2i, pad, add)
    targ = shift_targets(ids, 0) if symbol_mode else []
    return {
        "case_id": int(i),
        "mode": "symbols" if symbol_mode else "plain",
        "text": text,
        "text_len": text_len,
        "ids": ",".join(str(x) for x in ids),
        "mask": ",".join(str(x) for x in mask),
        "targ": ",".join(str(x) for x in targ),
    }


FAMILIES["kernel_text2ids"] = (compute_text2ids, N_CASES)


def compute_suffix_dedup(i: int) -> list[dict]:
    """Real suffix-array span dedup (kernels/suffix.py): per case, a
    3-5 doc corpus with PLANTED cross-doc repeats (a shared
    boilerplate run >= t, a sub-threshold shared run that must
    survive, and an intra-doc-only repeat that must survive the
    cross-doc criterion), plus random filler. Pins the SA order
    digest, Kasai's longest-repeat length, the duplicated-start
    count, and every doc's rebuilt text."""
    from ..kernels.suffix import (
        build_corpus,
        cross_doc_dup_starts,
        keep_masks,
        lcp_array,
        suffix_array,
    )

    rng = _rng("suffixdedup", i)
    t = int(rng.integers(3, 7))
    vocab = [f"w{k}" for k in range(8)]

    def rand_tokens(lo, hi):
        return [vocab[int(x)] for x in rng.integers(0, len(vocab), size=int(rng.integers(lo, hi)))]

    boiler = [f"b{k}" for k in range(t + int(rng.integers(0, 4)))]  # >= t, distinct alphabet
    short = [f"s{k}" for k in range(max(1, t - 1))]  # < t: must survive
    intra = [f"r{k}" for k in range(t)]  # repeated within ONE doc only
    n_docs = int(rng.integers(3, 6))
    docs = []
    for d in range(n_docs):
        doc = rand_tokens(0, 6)
        if d < 2 or rng.random() < 0.5:
            doc += boiler  # cross-doc repeat in >= 2 docs
        # per-doc guard tokens fence the sub-threshold run so random
        # filler coinciding across docs cannot extend it to >= t
        doc += rand_tokens(0, 6) + [f"u{d}a"] + short + [f"u{d}b"] + rand_tokens(0, 4)
        if d == 0:
            doc += intra + rand_tokens(1, 3) + intra  # intra-doc only
        docs.append(doc)

    # ONE SA+LCP construction; every derived product (digest, longest
    # repeat, dup starts, cleaned docs) reads the same pair — this
    # compute runs inside mapInPandas on every battery execution, not
    # just at fixture-build time
    seq, doc_of, pos_of = build_corpus(docs)
    sa = suffix_array(seq)
    lcp = lcp_array(seq, sa)
    digest = 0
    for v in sa:
        digest = (digest * 1000003 + int(v)) % 2147483647
    lrs_len = int(lcp.max()) if len(lcp) else 0
    starts = cross_doc_dup_starts(seq, doc_of, t, sa=sa, lcp=lcp)
    n_starts = len(starts)
    masks = keep_masks(starts, doc_of, pos_of, [len(d) for d in docs], t)
    cleaned = [
        ([tok for tok, m in zip(doc, mask) if m], int(mask.sum()))
        for doc, mask in zip(docs, masks)
    ]
    # invariants asserted at fixture-build time so a broken kernel
    # cannot silently ship: boiler gone everywhere it was planted
    # >= 2x, short and intra runs untouched
    for doc, (kept, _) in zip(docs, cleaned):
        joined = " ".join(kept)
        if sum(1 for d2 in docs if " ".join(boiler) in " ".join(d2)) >= 2:
            if " ".join(boiler) in joined:
                raise AssertionError(f"planted boiler survived (case {i})")
        if " ".join(short) not in " ".join(doc):
            raise AssertionError("short run missing from source")
        if " ".join(short) not in joined:
            raise AssertionError(f"sub-threshold run removed (case {i})")
    if " ".join(intra) not in " ".join(cleaned[0][0]):
        raise AssertionError(f"intra-doc-only repeat removed (case {i})")
    return [
        {
            "case_id": int(i),
            "doc_id": int(d),
            "t": t,
            "n_tokens": len(docs[d]),
            "n_kept": int(n_kept),
            "lrs_len": int(lrs_len),
            "n_dup_starts": int(n_starts),
            "sa_digest": int(digest),
            "cleaned": " ".join(kept),
        }
        for d, (kept, n_kept) in enumerate(cleaned)
    ]


FAMILIES["kernel_suffix_dedup"] = (compute_suffix_dedup, N_CASES)


def compute_pad_canvas(i: int) -> dict:
    """P6 pad-to-canvas gate (reference detect_dataset.py:102-117):
    random image + canvas per case across all three layouts; pins the
    padded shape, dtype (float64 — the reference's bare np.zeros),
    content preservation (sum equality + top-left anchor digest) and
    all-zero padding."""
    from ..kernels.resize import pad_to_canvas

    rng = _rng("padcanvas", i)
    layout = ("CHW", "HWC", "HW")[i % 3]
    h, w = int(rng.integers(2, 9)), int(rng.integers(2, 9))
    ch, cw = h + int(rng.integers(0, 5)), w + int(rng.integers(0, 5))
    c = int(rng.integers(1, 4))
    if layout == "CHW":
        img = rng.integers(0, 255, size=(c, h, w))
    elif layout == "HWC":
        img = rng.integers(0, 255, size=(h, w, c))
    else:
        img = rng.integers(0, 255, size=(h, w))
    out = pad_to_canvas(img, (ch, cw), layout)
    # digest over the WHOLE padded canvas, row-major (padding zeros
    # included — a misplaced anchor or dirty canvas changes it)
    flat = out.ravel()
    digest = 0
    for v in flat:
        digest = (digest * 1000003 + int(v)) % 2147483647
    return {
        "case_id": int(i),
        "layout": layout,
        "in_h": h,
        "in_w": w,
        "canvas_h": ch,
        "canvas_w": cw,
        "out_dtype": str(out.dtype),
        "sum_preserved": bool(float(out.sum()) == float(img.sum())),
        "pix_digest": int(digest),
    }


FAMILIES["kernel_pad_canvas"] = (compute_pad_canvas, N_CASES)
