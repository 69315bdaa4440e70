"""Invariant checks for multimodal batch 19 (q264-q266): chunk plans
must cover every sample with the specified overlap, tile grids must
tile exactly, and the modality budget must respect its cap."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.multimodal2 import CHUNK, STRIDE, TILE

REGISTRY = load_registry()


def test_audio_chunks_cover_stream(spark, sf_dir):
    out = REGISTRY["q264_audio_chunk_plan"].fn(spark, sf_dir).toPandas()
    for mid, grp in out.groupby("media_id"):
        g = grp.sort_values("chunk_idx").reset_index(drop=True)
        # contiguous indices, first starts at 0, exactly one last flag
        assert g.chunk_idx.tolist() == list(range(len(g)))
        assert g.start_sample.iloc[0] == 0
        assert g.is_last.sum() == 1 and g.is_last.iloc[-1]
        # coverage: each window starts before the previous one ends
        # (overlap = CHUNK - STRIDE) and the last window reaches the end
        for i in range(1, len(g)):
            assert g.start_sample.iloc[i] == g.start_sample.iloc[i - 1] + STRIDE
            assert g.start_sample.iloc[i] < g.end_sample.iloc[i - 1]
        assert (g.end_sample - g.start_sample <= CHUNK).all()
        assert (g.end_sample - g.start_sample > 0).all()
        # the penultimate window must NOT already reach the end
        # (otherwise the plan emitted a redundant chunk)
        if len(g) > 1:
            assert g.end_sample.iloc[-2] < g.end_sample.iloc[-1]


def test_image_tiles_tile_exactly(spark, sf_dir):
    out = REGISTRY["q265_image_tile_plan"].fn(spark, sf_dir).toPandas()
    assert (out.n_tiles == out.tiles_x * out.tiles_y).all()
    # grid covers the image: (tiles-1)*TILE + last extent == dimension
    assert ((out.tiles_x - 1) * TILE + out.last_col_width == out.w).all()
    assert ((out.tiles_y - 1) * TILE + out.last_row_height == out.h).all()
    assert (out.last_col_width.between(1, TILE)).all()
    assert (out.last_row_height.between(1, TILE)).all()
    # partial count: full interior grid subtracted from the total
    full_x = out.tiles_x.where(out.w % TILE == 0, out.tiles_x - 1)
    full_y = out.tiles_y.where(out.h % TILE == 0, out.tiles_y - 1)
    expect = (out.n_tiles - full_x * full_y).where(
        ~((out.w % TILE == 0) & (out.h % TILE == 0)), 0
    )
    assert (out.n_partial_tiles == expect).all()


def test_modal_budget_respected(spark, sf_dir):
    out = REGISTRY["q266_modal_token_budget"].fn(spark, sf_dir).toPandas()
    assert set(out.kind) <= {"image", "audio", "video"}
    assert (out.budget_used <= 40000).all()
    assert (out.total_tokens == out.budget_used).all()  # running total == sum
    assert (out.n_docs > 0).all()
