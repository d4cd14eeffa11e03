"""Text encoder + layout conditional builder tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lfm_tpu.data.layout import (
    Annotation,
    ObjectsBoundingBoxConditionalBuilder,
    ObjectsCenterPointsConditionalBuilder,
    filter_annotations,
    horizontally_flip_bbox,
    rescale_annotations,
)
from lfm_tpu.nn.text_encoder import BERTEmbedder, SimpleTokenizer, TransformerTextEncoder


def test_simple_tokenizer():
    tk = SimpleTokenizer(max_length=16)
    out = tk(["hello world", "a much longer sentence with many words"])
    assert out.shape == (2, 16)
    assert out[0, 0] == 101  # CLS
    assert 102 in out[0]     # SEP
    # deterministic
    np.testing.assert_array_equal(out, tk(["hello world", "a much longer sentence with many words"]))


def test_transformer_text_encoder_shapes():
    m = TransformerTextEncoder(dim=64, depth=2, vocab_size=1000, max_seq_len=16)
    tokens = jnp.zeros((2, 16), jnp.int32)
    p = m.init(jax.random.PRNGKey(0), tokens)
    out = m.apply(p, tokens)
    assert out.shape == (2, 16, 64)


def test_bert_embedder_end_to_end():
    emb = BERTEmbedder(n_embed=64, n_layer=2, vocab_size=1000, max_seq_len=16,
                       tokenizer=SimpleTokenizer(16, 1000))
    params = emb.init(jax.random.PRNGKey(0))
    z = emb.encode(params, ["a cat", "two dogs playing"])
    assert z.shape == (2, 16, 64)
    assert np.isfinite(np.asarray(z)).all()


def test_coordinate_tokenization_roundtrip():
    b = ObjectsCenterPointsConditionalBuilder(10, 8, 1024)
    assert b.no_sections == 32
    for x, y in [(0.0, 0.0), (1.0, 1.0), (0.5, 0.25)]:
        t = b.tokenize_coordinates(x, y)
        rx, ry = b.coordinates_from_token(t)
        assert abs(rx - x) < 1 / 31 + 1e-9
        assert abs(ry - y) < 1 / 31 + 1e-9


def test_center_points_build_and_inverse():
    b = ObjectsCenterPointsConditionalBuilder(10, 4, 1024)
    anns = [
        Annotation(bbox=(0.1, 0.1, 0.2, 0.2), category_no=3, area=0.04),
        Annotation(bbox=(0.5, 0.5, 0.3, 0.3), category_no=7, area=0.09),
    ]
    cond = b.build(anns)
    assert cond.shape == (8,)  # 4 objects x 2 tokens
    objs, crop = b.inverse_build(cond)
    assert len(objs) == 2
    assert {o[0] for o in objs} == {3, 7}
    assert crop is None


def test_bbox_builder_with_crop():
    b = ObjectsBoundingBoxConditionalBuilder(10, 3, 1024, encode_crop=True)
    anns = [Annotation(bbox=(0.2, 0.2, 0.4, 0.4), category_no=5, area=0.16)]
    cond = b.build(anns, crop_coordinates=(0.0, 0.0, 1.0, 1.0))
    assert cond.shape == (3 * 3 + 2,)
    objs, crop = b.inverse_build(cond)
    assert len(objs) == 1
    cls, bbox = objs[0]
    assert cls == 5
    assert abs(bbox[0] - 0.2) < 0.05 and abs(bbox[2] - 0.4) < 0.07
    assert crop is not None


def test_flip_and_filter():
    assert horizontally_flip_bbox((0.1, 0.2, 0.3, 0.4)) == (0.6, 0.2, 0.3, 0.4)
    anns = [
        Annotation(bbox=(0.0, 0.0, 0.1, 0.1), category_no=0, area=0.01),
        Annotation(bbox=(0.9, 0.9, 0.1, 0.1), category_no=1, area=0.01),
    ]
    kept = filter_annotations(anns, (0.0, 0.0, 0.5, 0.5))
    assert len(kept) == 1 and kept[0].category_no == 0
    rescaled = rescale_annotations(kept, (0.0, 0.0, 0.5, 0.5), flip=False)
    assert abs(rescaled[0].bbox[2] - 0.2) < 1e-9  # 0.1 / 0.5


def test_group_parameter_representation():
    b = ObjectsCenterPointsConditionalBuilder(10, 2, 1024, use_group_parameter=True)
    a = Annotation(bbox=(0.1, 0.1, 0.2, 0.2), category_no=3, area=0.04, is_group_of=True)
    rep = b.object_representation(a)
    assert rep == 13  # 3 + 10*1
    back = b.representation_to_annotation(rep)
    assert back.category_no == 3 and back.is_group_of


def test_annotated_objects_coco(tmp_path):
    """COCO instances JSON -> images + builder token sequences."""
    import json
    from PIL import Image

    from lfm_tpu.data.annotated_objects import AnnotatedObjectsCoco

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    coco = {"categories": [{"id": 7, "name": "cat"}, {"id": 9, "name": "dog"}],
            "images": [], "annotations": []}
    for i in range(3):
        name = f"{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (64, 80, 3), np.uint8)).save(img_dir / name)
        coco["images"].append({"id": i, "file_name": name, "width": 80, "height": 64})
        coco["annotations"].append({
            "id": 10 * i, "image_id": i, "category_id": 7,
            "bbox": [8, 8, 24, 24], "area": 24 * 24, "iscrowd": 0,
        })
        coco["annotations"].append({
            "id": 10 * i + 1, "image_id": i, "category_id": 9,
            "bbox": [40, 20, 16, 30], "area": 16 * 30, "iscrowd": 0,
        })
    ann_file = tmp_path / "instances.json"
    ann_file.write_text(json.dumps(coco))

    ds = AnnotatedObjectsCoco(str(img_dir), str(ann_file), target_image_size=32,
                              max_objects_per_image=4, no_tokens=1024,
                              random_flip=False)
    assert len(ds) == 3
    assert ds.no_classes == 2
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert item["objects_bbox"].shape == (12,)          # 4 objects x 3 tokens
    assert item["objects_center_points"].shape == (8,)  # 4 objects x 2 tokens
    # decode back: category numbers present
    objs, _ = ds.conditional_builders["objects_bbox"].inverse_build(item["objects_bbox"])
    assert 0 < len(objs) <= 2
    assert all(cls in (0, 1) for cls, _ in objs)


def test_bert_embedder_parity_vs_reference_torch():
    """Activation parity of TransformerTextEncoder against the reference's
    actual BERTEmbedder (models/encoder.py:52-87 over the vendored
    x_transformer.py), default config n_embed=512/n_layer=8, tokens fed
    directly (use_tokenizer=False — no transformers dependency)."""
    import torch

    from tests.test_convert import _import_reference_dit

    _import_reference_dit()  # installs the timm stub + /root/reference path
    from models.encoder import BERTEmbedder as RefBERTEmbedder

    from lfm_tpu.nn.text_encoder import convert_text_encoder_state_dict

    torch.manual_seed(0)
    ref = RefBERTEmbedder(n_embed=512, n_layer=8, use_tokenizer=False,
                          device="cpu")
    ref.eval()

    mine = TransformerTextEncoder(dim=512, depth=8)
    params = convert_text_encoder_state_dict(ref.state_dict(), depth=8)

    rng = np.random.default_rng(3)
    tokens = rng.integers(0, 30522, size=(2, 77))
    with torch.no_grad():
        want = ref(torch.from_numpy(tokens)).numpy()
    got = mine.apply(params, jnp.asarray(tokens, jnp.int32))
    assert got.shape == (2, 77, 512)
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)
