"""Staged main-content post-process over DOM blocks.

This is the semantic core, structured stage-for-stage after the
reference's DB detection post-process
(``gluonocr/post_process/db_postprocess.py``), with DOM-block analogs
for each geometric operator:

==== ============================== =====================================
ref   reference operator             block analog here
==== ============================== =====================================
D1    ``bitmap = pred > thresh``     content-probability > PROB_THRESH
      (db_postprocess.py:30,81)
D2    ``cv2.findContours``           group adjacent surviving blocks into
      (db_postprocess.py:35-37)      regions (connected components in
                                     document order)
D4    min-size filter                drop regions shorter than MIN_CHARS
      (db_postprocess.py:93-94)
D5    ``box_score_fast`` masked mean char-weighted mean probability of the
      (db_postprocess.py:150-162)    region's member blocks
D6    score < box_thresh drop        region score < BOX_THRESH drop
      (db_postprocess.py:97-99)
D7    unclip / Vatti dilate          pull in adjacent borderline heading /
      (db_postprocess.py:120-126)    caption blocks (UNCLIP_PROB band)
D8    area filter                    drop regions below MIN_AREA_CHARS
      (db_postprocess.py:105-107)
D19   max_candidates cap             cap blocks considered per page
      (post_proc_op.cpp:20-21)
C2    reading order                  regions sorted by document order
==== ============================== =====================================

Filter order deliberately mirrors the reference's cheap-first ordering
(size → score → unclip → size/area, db_postprocess.py:90-107).

All arithmetic is plain Python floats over small per-page lists —
deterministic regardless of partitioning, which is what the
byte-identical contract needs.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

from .dom import Block

# --- tuned constants (engine parameters, defaults mirror the demo's) ---
PROB_THRESH = 0.3  # D1; reference thresh=0.3 (db_postprocess.py:14)
BOX_THRESH = 0.3  # D6; demos pass box_thresh=0.3 (scripts/detect/db/demo.py)
UNCLIP_PROB = 0.15  # D7 borderline band lower bound
MIN_CHARS = 2  # D4 min_size analog (min_size=4 px in reference)
MIN_AREA_CHARS = 2  # D8 min_area analog
MAX_CANDIDATES = 4096  # D19 cap
MAX_GAP = 1  # D2: merge regions separated by ≤ this many dropped blocks


@dataclass(frozen=True)
class ExtractionConfig:
    """Tunable post-process thresholds — the engine's analog of the
    reference demos' CLI knobs (``--thresh --box_thresh --unclip_ratio
    --min_size``, scripts/detect/db/demo.py). Frozen + tiny so Spark
    ships it to executors in the UDF closure (the config-broadcast
    pattern; real model weights would ride ``sc.broadcast`` the same
    way)."""

    prob_thresh: float = PROB_THRESH  # D1
    box_thresh: float = BOX_THRESH  # D6
    unclip_prob: float = UNCLIP_PROB  # D7
    min_chars: int = MIN_CHARS  # D4
    min_area_chars: int = MIN_AREA_CHARS  # D8
    max_candidates: int = MAX_CANDIDATES  # D19
    max_gap: int = MAX_GAP  # D2


DEFAULT_CONFIG = ExtractionConfig()

# Class/id tokens that mark boilerplate vs. content. Standard public
# boilerplate-removal vocabulary (cf. Boilerpipe / jusText literature).
BOILER_TOKENS = frozenset(
    {
        "nav",
        "navbar",
        "menu",
        "footer",
        "header",
        "sidebar",
        "side",
        "ad",
        "ads",
        "advert",
        "advertisement",
        "banner",
        "cookie",
        "consent",
        "comment",
        "comments",
        "share",
        "sharing",
        "social",
        "breadcrumb",
        "breadcrumbs",
        "pagination",
        "pager",
        "promo",
        "related",
        "widget",
        "subscribe",
        "newsletter",
        "copyright",
        "legal",
        "disclaimer",
        "skip",
        "toolbar",
        "dropdown",
        "login",
        "signup",
        "search",
    }
)
CONTENT_TOKENS = frozenset(
    {
        "content",
        "article",
        "main",
        "post",
        "entry",
        "body",
        "text",
        "story",
        "page",
        "blog",
        "prose",
        "paragraph",
    }
)
BOILER_CONTAINERS = frozenset({"nav", "header", "footer", "aside", "form"})
CONTENT_CONTAINERS = frozenset({"article", "main"})


def block_evidence(b: Block) -> str:
    """Resolve the block's ancestor-chain evidence: ``"boiler"``,
    ``"content"``, or ``""`` (none).

    Nearest-ancestor-first: the deepest DOM element carrying any
    boilerplate/content signal (semantic tag or css class/id token)
    decides — so ``<section class="comments">`` inside ``<main>`` is
    boilerplate even though an outer ancestor says content. This is
    the DOM analog of the probability map being *local*: the
    reference's per-pixel probability reflects the nearest structure,
    not the page average.

    Memoized per chain tuple: sibling blocks share the identical
    chain object (the parser memoizes ``tuple(self._chain)``), so a
    page's ~40 blocks resolve evidence through a handful of cache
    hits instead of re-walking ancestor sets per block.
    """
    return _chain_evidence(b.chain)


@lru_cache(maxsize=4096)
def _chain_evidence(chain: tuple) -> str:
    for tag, css in reversed(chain):
        boiler = tag in BOILER_CONTAINERS or bool(css & BOILER_TOKENS)
        content = tag in CONTENT_CONTAINERS or bool(css & CONTENT_TOKENS)
        if boiler and not content:
            return "boiler"
        if content and not boiler:
            return "content"
        if boiler and content:  # conflicting signals on one element
            return "boiler"
    return ""


def block_probability(b: Block) -> float:
    """Content probability of one block — the per-region analog of the
    reference's probability map value (``pred[0,0]``,
    ``scripts/detect/db/demo.py:95``).

    Deterministic heuristic in [0, 1]: length prior, minus link
    density, shifted by nearest-ancestor evidence.
    """
    n = b.n_chars
    if n == 0:
        return 0.0
    # length prior: short fragments are usually chrome; saturates ~1 at 80+ chars
    p = min(1.0, n / 80.0) * 0.6 + 0.2
    # link density is the strongest boilerplate signal
    p -= 0.8 * b.link_density
    ev = block_evidence(b)
    if ev == "boiler":
        p -= 0.6
    elif ev == "content":
        p += 0.35
    # headings inside content flow get a small boost (often short)
    if b.is_heading and ev != "boiler":
        p += 0.15
    # list items with high link density are menus; plain list items are content
    if b.tag == "li" and b.link_density > 0.5:
        p -= 0.3
    return max(0.0, min(1.0, p))


@dataclass
class Region:
    """A contiguous run of content blocks — the analog of one detected
    text box (quad) in the reference."""

    blocks: list[Block]
    score: float = 0.0

    @property
    def start_order(self) -> int:
        return self.blocks[0].order

    @property
    def n_chars(self) -> int:
        return sum(b.n_chars for b in self.blocks)


def detect_regions(blocks: list[Block], cfg: ExtractionConfig = DEFAULT_CONFIG) -> list[Region]:
    """Run the staged D1→D8 post-process; returns regions in canonical
    reading order (document order, C2)."""
    blocks = blocks[: cfg.max_candidates]  # D19
    probs = [block_probability(b) for b in blocks]

    # D1: binarize
    kept_idx = [i for i, p in enumerate(probs) if p > cfg.prob_thresh]
    if not kept_idx:
        return []

    # D2: connected components over document order (gap ≤ max_gap low-prob
    # blocks tolerated, like contour connectivity tolerating small holes)
    groups: list[list[int]] = [[kept_idx[0]]]
    for i in kept_idx[1:]:
        if i - groups[-1][-1] <= 1 + cfg.max_gap:
            groups[-1].append(i)
        else:
            groups.append([i])

    regions: list[Region] = []
    for g in groups:
        members = [blocks[i] for i in g]
        # D4: min-size
        total = sum(b.n_chars for b in members)
        if total < cfg.min_chars:
            continue
        # D5: char-weighted mean probability (masked regional mean)
        score = sum(probs[i] * blocks[i].n_chars for i in g) / max(1, total)
        # D6: score filter
        if score < cfg.box_thresh:
            continue
        # D7: unclip — pull in adjacent borderline headings/captions.
        # Like the reference's unclip it only grows the region; it never
        # crosses hard boilerplate evidence (css/container signals).
        def _unclippable(j: int) -> bool:
            nb = blocks[j]
            return (
                cfg.unclip_prob <= probs[j] <= cfg.prob_thresh
                and (nb.is_heading or nb.tag == "figcaption")
                and block_evidence(nb) != "boiler"
            )

        lo, hi = g[0], g[-1]
        if lo - 1 >= 0 and _unclippable(lo - 1):
            members.insert(0, blocks[lo - 1])
        if hi + 1 < len(blocks) and _unclippable(hi + 1):
            members.append(blocks[hi + 1])
        # D8: area filter (post-unclip size check, db_postprocess.py:102-107)
        if sum(b.n_chars for b in members) < cfg.min_area_chars:
            continue
        regions.append(Region(blocks=members, score=score))

    # C2: canonical reading order = document order of first member
    regions.sort(key=lambda r: r.start_order)
    return regions
