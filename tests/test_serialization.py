"""save/load roundtrip of scene objects incl. characterize databases, and
size advantage over the repr format."""

import numpy as np

from metalens_tpu import Grating, GratingCollection
from metalens_tpu.hexgrid import HexGridSet
from metalens_tpu.serialization import save, load
from metalens_tpu.units import nm


def test_grating_roundtrip(tmp_path):
    g = Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                grating_period=1200 * nm,
                xyrra_list_in_nm_deg=np.array([[0., 0., 120., 90., 0.]]))
    g.characterize(u_steps=2, ux_min=0.3, ux_max=0.5, wavelength=580 * nm,
                   numG=20)
    p = str(tmp_path / "g.npz")
    save(g, p)
    g2 = load(p)
    np.testing.assert_allclose(g2.xyrra_list, g.xyrra_list)
    assert g2.n_glass == 0 and isinstance(g2.n_glass, int)
    assert g2.data == g.data


def test_collection_roundtrip_and_size(tmp_path):
    gs = [Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                  grating_period=gp * nm,
                  xyrra_list_in_nm_deg=np.array([[gp / 10, 0., 100., 90., 0.]]))
          for gp in (1100.0, 1200.0)]
    gc = GratingCollection(target_wavelength=580 * nm,
                           lateral_period=320 * nm, lens_type="cyl",
                           grating_list=gs)
    gc.characterize(wavelength=580 * nm, numG=20, u_steps=3)
    p = str(tmp_path / "gc.npz")
    save(gc, p)
    gc2 = load(p)
    assert gc2.lens_type == "cyl"
    assert len(gc2.grating_list) == 2
    assert gc2.grating_list[1].data == gc.grating_list[1].data
    # interpolators rebuild from the loaded data
    gc2.build_interpolators()
    assert len(gc2.interpolators) > 0
    import os
    assert os.path.getsize(p) < len(repr(gc).encode()) / 2


def test_hexgridset_roundtrip(tmp_path):
    hgs = HexGridSet(sep=320 * nm, cyl_height=550 * nm, num_entries=3)
    hgs.characterize(wavelength=580 * nm, numG=20, just_normal=True)
    p = str(tmp_path / "h.npz")
    save(hgs, p)
    h2 = load(p)
    np.testing.assert_allclose(h2.x_amp_list, hgs.x_amp_list)
    assert h2.grating_list[0].data == hgs.grating_list[0].data
    assert h2.sep == hgs.sep


def test_save_returns_real_filename_without_suffix(tmp_path):
    """np.savez appends '.npz'; save() must return the path actually
    written so load(save(obj, p)) always works."""
    import numpy as np
    from metalens_tpu import Grating
    from metalens_tpu.serialization import save, load
    from metalens_tpu.units import nm
    g = Grating(lateral_period=320 * nm, cyl_height=550 * nm,
                grating_period=1200 * nm,
                xyrra_list_in_nm_deg=np.array([[0., 0., 120., 90., 0.]]))
    p = save(g, str(tmp_path / "noext"))
    assert p.endswith(".npz")
    g2 = load(p)
    np.testing.assert_allclose(g2.xyrra_list, g.xyrra_list)
