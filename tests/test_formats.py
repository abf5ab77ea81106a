import numpy as np

from reze_tpu.formats.vmd import load_vmd


def test_pmx_golden_counts_model2(pmx_model2):
    m = pmx_model2
    assert m.positions.shape == (28842, 3)
    assert m.indices.size == 101199
    assert len(m.materials) == 19
    assert len(m.bones) == 349
    assert len(m.morphs) == 72
    assert len(m.rigid_bodies) == 257
    assert len(m.joints) == 406
    # material index counts must cover the whole index buffer
    assert sum(mat.index_count for mat in m.materials) == m.indices.size
    # classification parity with the reference keyword rules
    assert [mat.name for mat in m.materials if mat.is_hair] == ["hair_f"]
    eye_names = {mat.name for mat in m.materials if mat.is_eye}
    assert {"目白", "右瞳", "左瞳", "eyebrow", "eyelash"} <= eye_names
    transparent = [mat.name for mat in m.materials if float(mat.diffuse[3]) < 0.999]
    assert "dress" in transparent


def test_pmx_golden_counts_model1(pmx_model1):
    m = pmx_model1
    assert m.positions.shape[0] == 28789
    assert len(m.bones) == 471
    ik_bones = [b for b in m.bones if b.is_ik]
    assert len(ik_bones) == 4
    leg = next(b for b in ik_bones if b.name == "右足ＩＫ")
    assert leg.ik.loop_count == 40
    assert len(leg.ik.links) == 2
    assert leg.ik.links[0].has_limit  # knee


def test_pmx_skinning_quantization(pmx_model2):
    joints, weights = pmx_model2.quantized_skinning()
    assert joints.dtype == np.uint16
    assert weights.dtype == np.uint8
    assert (weights.astype(np.int64).sum(axis=1) == 255).all()
    assert (joints < len(pmx_model2.bones)).all()


def test_pmx_bind_translation_roundtrip(pmx_model2):
    bind = pmx_model2.bind_translations()
    # re-accumulate to absolute and compare
    n = len(pmx_model2.bones)
    acc = np.zeros((n, 3), np.float32)
    for i, b in enumerate(pmx_model2.bones):
        acc[i] = bind[i] + (acc[b.parent] if 0 <= b.parent < n else 0)
    abspos = np.stack([b.position for b in pmx_model2.bones])
    np.testing.assert_allclose(acc, abspos, atol=1e-4)


def test_vmd_pool(pool_vmd_path):
    v = load_vmd(pool_vmd_path)
    assert len(v.bone_names) == 68
    assert len(set(v.bone_names)) == 36
    assert abs(v.duration_seconds() - 1.5) < 1e-6
    # rotations are normalized quaternions
    norms = np.linalg.norm(v.bone_rotations, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    # interpolation block decoded into [0, 1]
    assert v.bone_interp.min() >= 0.0 and v.bone_interp.max() <= 1.0
    tracks = v.grouped_bone_tracks()
    assert len(tracks) == 36
    for tr in tracks.values():
        assert (np.diff(tr["t"]) >= 0).all()


def test_build_model2(model2_path):
    from reze_tpu.core.build import load_model
    from reze_tpu.core.types import CLASS_EYE, CLASS_HAIR, CLASS_OPAQUE, CLASS_TRANSPARENT

    built = load_model(model2_path)
    g = built.arrays.geometry
    # class ranges cover all real triangles exactly once
    total = sum(r[1] for r in g.class_ranges)
    assert total == 101199 // 3
    assert g.class_ranges[CLASS_HAIR][1] == 4041 // 3
    assert g.class_ranges[CLASS_TRANSPARENT][1] == 14625 // 3
    eye_count = 126 + 1308 + 510 + 420 + 420
    assert g.class_ranges[CLASS_EYE][1] == eye_count // 3
    assert g.class_ranges[CLASS_OPAQUE][1] == (101199 - 4041 - 14625 - eye_count) // 3
    # skinning dense weights row sums == 1 for real vertices
    import numpy as np

    dense = np.asarray(built.arrays.skinning.weights_dense)
    v = g.n_vertices
    np.testing.assert_allclose(dense[:v].sum(axis=1), 1.0, atol=1e-6)
    assert dense[v:].sum() == 0
    # atlas has entries for every used diffuse texture
    assert built.arrays.atlas.texels.shape[0] >= 1
    assert built.arrays.physics.n_bodies == 257
    assert built.arrays.physics.n_joints == 406
