"""Tests for the yacs-style config system."""

import os
import textwrap

import pytest

from multi_part_assembly_tpu.utils import CN, CfgNode, load_cfg_file


def test_attribute_access():
    cfg = CN()
    cfg.exp = CN()
    cfg.exp.batch_size = 32
    assert cfg.exp.batch_size == 32
    assert cfg['exp']['batch_size'] == 32


def test_freeze():
    cfg = CN()
    cfg.a = 1
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.a = 2
    cfg.defrost()
    cfg.a = 2
    assert cfg.a == 2


def test_clone_independent():
    cfg = CN()
    cfg.sub = CN()
    cfg.sub.x = [1, 2]
    c2 = cfg.clone()
    c2.sub.x = [3]
    assert cfg.sub.x == [1, 2]


def test_merge_from_list_typecast():
    cfg = CN()
    cfg.exp = CN()
    cfg.exp.lr = 0.1
    cfg.exp.n = 5
    cfg.exp.flag = False
    cfg.merge_from_list(['exp.lr', '0.5', 'exp.n', '7', 'exp.flag', 'True'])
    assert cfg.exp.lr == 0.5 and cfg.exp.n == 7 and cfg.exp.flag is True


def test_config_file_composition(tmp_path):
    """Leaf config + _base_ parents, child keys win (reference semantics)."""
    base = tmp_path / 'base.py'
    base.write_text(
        textwrap.dedent("""
        from multi_part_assembly_tpu.utils import CN
        _C = CN()
        _C.lr = 1e-3
        _C.wd = 0.
        def get_cfg_defaults():
            return _C.clone()
        """))
    leaf = tmp_path / 'leaf.py'
    leaf.write_text(
        textwrap.dedent("""
        import os
        from multi_part_assembly_tpu.utils import CN, merge_cfg
        _base_ = {'optimizer': 'base.py'}
        _C = CN()
        _C.optimizer = CN()
        _C.optimizer.lr = 5e-4
        def get_cfg_defaults():
            cfg = _C.clone()
            return merge_cfg(cfg, os.path.dirname(os.path.abspath(__file__)),
                             _base_)
        """))
    cfg = load_cfg_file(str(leaf))
    assert cfg.optimizer.lr == 5e-4  # child wins
    assert cfg.optimizer.wd == 0.  # parent fills in
    assert os.path.isabs(cfg.cfg_file)


def test_real_config_tree():
    """The shipped config tree composes end to end."""
    root = os.path.join(os.path.dirname(os.path.dirname(__file__)), 'configs')
    leaf = os.path.join(
        root, 'pn_transformer', 'pn_transformer',
        'pn_transformer-32x1-cosine_400e-everyday.py')
    if not os.path.exists(leaf):
        pytest.skip('config tree not built yet')
    cfg = load_cfg_file(leaf)
    assert cfg.model.name == 'pn_transformer'
    assert cfg.data.dataset == 'geometry'
    assert cfg.exp.num_epochs == 400
    assert cfg.loss.trans_loss_w == 1.


def test_dump_str():
    cfg = CfgNode({'a': 1, 'b': {'c': 'x'}})
    s = str(cfg)
    assert 'a: 1' in s and "c: 'x'" in s
