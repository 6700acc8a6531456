"""Image-level parity gate vs the reference's published renders.

The reference commits screenshots of its viewport for Design1/Design2/Logo
(/root/reference/FilesForREADME/, README.md:10-16).  These are window
screenshots (cropped to content, arbitrary scale), not raw framebuffers, so
the gate is pose-aligned and scale-free: crop both images to their non-white
content, resize to a common raster, then require (a) hit-mask IoU and (b)
blurred-grayscale correlation above threshold.

Calibration (round 3, 2026-08-21; /tmp-scripted measurement of matching vs
cross-design pairs): renders at 256x192 with the hit-preserving over-relaxed
march (same silhouettes as exact, ~35% fewer steps — the suite previously
burned ~9 CPU-minutes rendering these gates at 320x240 exact); a 1-px
Gaussian blur before correlation suppresses the sampling-rate aliasing that
dominated corr at low resolutions (unblurred corr @256x192: 0.970-0.976;
blurred: 0.991-0.994) without weakening discrimination (cross-design blurred
corr <= 0.43, cross IoU <= 0.56).

Skips when the reference tree is absent.
"""

import os

import numpy as np
import pytest

import designs

REF_DIR = "/root/reference/FilesForREADME"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference images not mounted"
)

try:
    from PIL import Image, ImageFilter
except ImportError:  # pragma: no cover
    pytestmark = pytest.mark.skip(reason="PIL unavailable")


def content_mask(img, thresh=12):
    """Non-white pixels: the viewport miss color is white (1,1,1)."""
    return (255 - img[..., :3].astype(np.int32)).max(axis=-1) > thresh


def crop_to_content(img, mask):
    ys, xs = np.nonzero(mask)
    return img[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1, :3]


def resized_mask(img, size=200):
    m = content_mask(img)
    sub = crop_to_content(img, m)
    mm = content_mask(sub)
    im = Image.fromarray((mm * 255).astype(np.uint8)).resize(
        (size, size), Image.BILINEAR
    )
    return np.asarray(im) > 127


def resized_gray(img, size=128, blur=1.0):
    sub = crop_to_content(img, content_mask(img))
    im = (
        Image.fromarray(sub.astype(np.uint8))
        .convert("L")
        .resize((size, size), Image.BILINEAR)
    )
    if blur:
        im = im.filter(ImageFilter.GaussianBlur(blur))
    return np.asarray(im).astype(np.float64)


def render_u8(name, width=256, height=192):
    from designcsg_tpu.config import RenderConfig
    from designcsg_tpu.ops.raymarch import render_scene, to_u8

    scene = designs.get_design(name)
    # Over-relaxed march: hit-preserving (tests/test_raymarch.py), so the
    # content mask and large-scale shading this gate measures are unchanged.
    config = RenderConfig(width=width, height=height, march_overrelax=1.6)
    return np.asarray(to_u8(render_scene(scene, config=config)))


@pytest.mark.parametrize(
    "name,ref_png,size,min_iou,min_corr",
    [
        # measured: d1/d2 @256x192/blur1 iou .9618/.9432 corr .991/.994;
        # logo @160x120/blur1 iou .9580 corr .9925 (its render is ~10x the
        # others' cost — the letter brush evaluates ~3k Bezier samples per
        # tape call — so its gate runs at the lower calibrated resolution)
        ("design1", "Design1_cropped.png", (256, 192), 0.93, 0.98),
        ("design2", "Hilbert_cropped.png", (256, 192), 0.92, 0.98),
        # Logo uses the reference's own CourierPrime font (same mount this
        # gate already requires), so glyph outlines match exactly.
        ("logo", "Logo_cropped.png", (160, 120), 0.92, 0.98),
    ],
)
def test_render_matches_published_image(name, ref_png, size, min_iou, min_corr):
    ours = render_u8(name, width=size[0], height=size[1])
    ref = np.asarray(Image.open(os.path.join(REF_DIR, ref_png)))

    mo, mr = resized_mask(ours), resized_mask(ref)
    iou = (mo & mr).sum() / (mo | mr).sum()
    assert iou > min_iou, f"{name}: hit-mask IoU {iou:.4f} <= {min_iou}"

    go, gr = resized_gray(ours), resized_gray(ref)
    corr = np.corrcoef(go.ravel(), gr.ravel())[0, 1]
    assert corr > min_corr, f"{name}: grayscale corr {corr:.4f} <= {min_corr}"
