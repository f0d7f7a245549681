"""Pure geometry functions reproducing the reference's coordinate semantics.

All functions are trivially vectorizable / cheap; they run inside
``map_batches`` stages (SURVEY.md §2.10). Reference sites:

  quad_from_bbox     — M7, `/root/reference/tesseract-recognize.cc:155-175`
  SENTINEL_QUAD      — whole-page bbox sentinel "0,0 0,0", `:160-161`
  clip_baseline      — M8 baseline clipped to bbox left/right edges, `:177-194`
  polystripe         — M8 (height, offset) from baseline<->corner distances, `:196-202`
  bucket_angle       — G1 dominant-angle correction buckets, `:800-813`
  seg_intersection   — segment-segment intersection helper, `:184-185`
"""

from __future__ import annotations

import math

Point = tuple[float, float]

# orientation enum mirroring Tesseract's ORIENTATION_PAGE_UP/RIGHT/LEFT/DOWN
UP, RIGHT, LEFT, DOWN = 0, 1, 2, 3

SENTINEL_QUAD: list[Point] = [(0.0, 0.0), (0.0, 0.0)]


def quad_from_bbox(
    x0: float,
    y0: float,
    x1: float,
    y1: float,
    orientation: int = UP,
    off_x: float = 0.0,
    off_y: float = 0.0,
    page_w: float | None = None,
    page_h: float | None = None,
) -> list[Point]:
    """4-point polygon from an axis-aligned bbox, vertex order rotated by the
    detected orientation (reference M7, tesseract-recognize.cc:163-172); a
    bbox covering the entire page collapses to the sentinel "0,0 0,0"
    (tesseract-recognize.cc:160-161). Crop offsets (off_x, off_y) translate
    crop-local coords back to page coords (NamedImage x/y, `:677,732`)."""
    if page_w is not None and x0 <= 0 and y0 <= 0 and x1 >= page_w and y1 >= page_h:
        return list(SENTINEL_QUAD)
    x0, y0, x1, y1 = x0 + off_x, y0 + off_y, x1 + off_x, y1 + off_y
    tl, tr, br, bl = (x0, y0), (x1, y0), (x1, y1), (x0, y1)
    if orientation == UP:
        return [tl, tr, br, bl]
    if orientation == RIGHT:
        return [tr, br, bl, tl]
    if orientation == LEFT:
        return [bl, tl, tr, br]
    return [br, bl, tl, tr]  # DOWN


def seg_intersection(a1: Point, a2: Point, b1: Point, b2: Point) -> Point | None:
    """Intersection point of segments a and b, or None (reference `:184-185`)."""
    ax, ay = a2[0] - a1[0], a2[1] - a1[1]
    bx, by = b2[0] - b1[0], b2[1] - b1[1]
    den = ax * by - ay * bx
    if den == 0:
        return None
    t = ((b1[0] - a1[0]) * by - (b1[1] - a1[1]) * bx) / den
    u = ((b1[0] - a1[0]) * ay - (b1[1] - a1[1]) * ax) / den
    if not (0.0 <= t <= 1.0 and 0.0 <= u <= 1.0):
        return None
    return (a1[0] + t * ax, a1[1] + t * ay)


def clip_baseline(
    baseline: tuple[Point, Point], quad: list[Point]
) -> tuple[Point, Point]:
    """Clip a 2-point baseline to the quad's left edge (p0-p3) and right edge
    (p1-p2); if an edge is not crossed the raw endpoint is kept (reference
    warns and keeps raw, tesseract-recognize.cc:177-194)."""
    if len(quad) < 4:
        return baseline
    p0, p1, p2, p3 = quad[:4]
    b0, b1 = baseline
    # extend the baseline generously so it reaches the edges
    dx, dy = b1[0] - b0[0], b1[1] - b0[1]
    n = math.hypot(dx, dy) or 1.0
    ex, ey = dx / n, dy / n
    big = 4.0 * (abs(p1[0] - p0[0]) + abs(p3[1] - p0[1]) + n)
    e0 = (b0[0] - ex * big, b0[1] - ey * big)
    e1 = (b1[0] + ex * big, b1[1] + ey * big)
    left = seg_intersection(e0, e1, p0, p3)
    right = seg_intersection(e0, e1, p1, p2)
    return (left if left is not None else b0, right if right is not None else b1)


def polystripe(baseline: tuple[Point, Point], quad: list[Point]) -> tuple[float, float]:
    """(height, offset) of the polystripe around a clipped baseline:
    height = 0.5*(up1+up2+down1+down2), offset = 0.5*(down1+down2)/height,
    guarded for height<=0 (reference tesseract-recognize.cc:196-203), where
    up_i/down_i are distances from baseline endpoints to the top/bottom quad
    corners on the same side."""
    if len(quad) < 4:
        return (0.0, 0.0)
    p0, p1, p2, p3 = quad[:4]
    b0, b1 = baseline
    up1 = math.dist(b0, p0)
    up2 = math.dist(b1, p1)
    down1 = math.dist(b0, p3)
    down2 = math.dist(b1, p2)
    height = 0.5 * (up1 + up2 + down1 + down2)
    if height <= 0:
        return (0.0, 0.0)
    offset = 0.5 * (down1 + down2) / height
    return (height, offset)


# detected rot90 count k (CCW turns making the stored raster upright) ->
# Tesseract orientation enum of the ORIGINAL raster: one CCW turn fixes a
# page whose text-up points right (ORIENTATION_PAGE_RIGHT), three fix LEFT.
# Consistent with the reference's enum->degrees table for the
# apply-image-orientation Property (tesseract-recognize.cc:614-617:
# RIGHT->-90, LEFT->90, DOWN->180), i.e. degrees {1: -90, 2: 180, 3: 90}.
ORIENT_FROM_K = {0: UP, 1: RIGHT, 2: DOWN, 3: LEFT}


def invert_rot90_point(x: float, y: float, k: int, up_w: float, up_h: float) -> Point:
    """Map a point from UPRIGHT page space (dims up_w x up_h) back to the
    stored raster's ORIGINAL space, inverting k CCW rot90 turns (continuous
    box-corner coords, no pixel-center -1). Used when emitting the
    reference's PRE-orientation-pass DOM (coords in original space, vertex
    order carrying the orientation, M7)."""
    k = k % 4
    if k == 0:
        return (x, y)
    if k == 1:  # original = rotate upright CW once
        return (up_h - y, x)
    if k == 2:
        return (up_w - x, up_h - y)
    return (y, up_w - x)  # k == 3


def invert_rot90_bbox(
    x0: float, y0: float, x1: float, y1: float, k: int, up_w: float, up_h: float
) -> tuple[float, float, float, float]:
    """Axis-aligned bbox mapped from upright space back to original raster
    space (min/max of the transformed corners)."""
    pts = [
        invert_rot90_point(x0, y0, k, up_w, up_h),
        invert_rot90_point(x1, y1, k, up_w, up_h),
    ]
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return (min(xs), min(ys), max(xs), max(ys))


def polystripe_coords(baseline: tuple[Point, Point], quad: list[Point]) -> list[Point]:
    """The polystripe polygon the reference stores as a TextLine's Coords
    (setLineCoords -> setPolystripe, tesseract-recognize.cc:196-202): a
    stripe of the computed (height, offset) around the clipped baseline.
    height*(1-offset) extends toward the reading-order top edge (quad p0-p1),
    height*offset toward the bottom. For an axis-aligned line whose baseline
    lies on the quad's bottom edge this reproduces the bbox quad exactly."""
    h, o = polystripe(baseline, quad)
    if h <= 0:
        return list(quad)
    b0, b1 = baseline
    dx, dy = b1[0] - b0[0], b1[1] - b0[1]
    norm = math.hypot(dx, dy) or 1.0
    dxu, dyu = dx / norm, dy / norm
    # unit normal pointing from the baseline toward the quad's top-left (p0)
    vx, vy = quad[0][0] - b0[0], quad[0][1] - b0[1]
    dot = vx * dxu + vy * dyu
    nx, ny = vx - dot * dxu, vy - dot * dyu
    nn = math.hypot(nx, ny)
    if nn == 0:  # degenerate quad: fall back to the raw quad
        return list(quad)
    nx, ny = nx / nn, ny / nn
    up, down = h * (1.0 - o), h * o
    return [
        (b0[0] + nx * up, b0[1] + ny * up),
        (b1[0] + nx * up, b1[1] + ny * up),
        (b1[0] - nx * down, b1[1] - ny * down),
        (b0[0] - nx * down, b0[1] - ny * down),
    ]


def bucket_angle(theta: float) -> int:
    """Dominant-baseline-angle correction bucket in degrees:
    [pi/4, 3pi/4) -> -90 ; (-3pi/4, -pi/4] -> +90 ; |theta| >= 3pi/4 -> 180 ;
    else 0 (reference G1, tesseract-recognize.cc:800-813)."""
    q = math.pi / 4
    if q <= theta < 3 * q:
        return -90
    if -3 * q < theta <= -q:
        return 90
    if abs(theta) >= 3 * q:
        return 180
    return 0


def dominant_angle(angles: list[float], weights: list[float] | None = None) -> float:
    """Length-weighted circular mean of baseline angles (G1 aggregate input,
    reference computes this over all TextLine baselines of a page)."""
    if not angles:
        return 0.0
    if weights is None:
        weights = [1.0] * len(angles)
    sx = sum(w * math.cos(a) for a, w in zip(angles, weights))
    sy = sum(w * math.sin(a) for a, w in zip(angles, weights))
    return math.atan2(sy, sx)
