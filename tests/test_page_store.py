import numpy as np

from vision_compression_project_tpu.raster import PdfDocument, make_pdf
from vision_compression_project_tpu.raster.page_store import PageStore


def test_page_store_roundtrip_quality_and_size(tmp_path):
    pdf = make_pdf(
        ["Store Test\nThe quick brown fox jumps over the lazy dog." * 3],
        tmp_path / "d.pdf",
    )
    with PdfDocument(pdf) as doc:
        rgb = doc.render_page(0, dpi=72)
    store = PageStore(tmp_path / "store")
    path = store.put(1, rgb)
    back = store.get(1)
    assert back.shape == rgb.shape
    err = np.abs(back.astype(np.int32) - rgb.astype(np.int32)).mean()
    assert err < 8.0, err
    # Text pixels survive: ink positions still dark.
    ink = rgb.min(axis=-1) < 100
    assert ink.any()
    assert (back[ink].mean() < 150)
    # Compression: far smaller than raw RGB.
    raw_bytes = rgb.nbytes
    assert path.stat().st_size < raw_bytes / 6
    assert store.pages() == [1]
    assert store.stats()["pages"] == 1
