"""Visualization-layer tests: the ParaView batch pipeline (SURVEY row 25,
reference visualization3D/grain.py / threshold.py / grain_video.py) driven
against a recording fake of paraview.simple — ParaView itself is an
optional environment dependency."""

import types

import pytest

from graingraphnn_tpu.viz import paraview_batch as pb


class _Obj:
    def __init__(self, **kw):
        self.__dict__.update(kw)
        self.calls = []

    def __getattr__(self, name):
        def f(*a, **k):
            self.calls.append((name, a, k))
        return f


class FakePV(types.SimpleNamespace):
    """Records the pipeline the module builds."""

    def __init__(self):
        super().__init__()
        self.log = []
        self.view = _Obj(ViewSize=[0, 0])
        self.lut = _Obj()
        self.disp = _Obj(Opacity=1.0)

    def LegacyVTKReader(self, FileNames):
        self.log.append(("read", tuple(FileNames)))
        return _Obj(kind="src")

    def Threshold(self, Input):
        self.log.append(("threshold",))
        t = _Obj(kind="thr")
        t.ClipType = _Obj()
        return t

    def Clip(self, Input):
        self.log.append(("clip",))
        c = _Obj(kind="clip")
        c.ClipType = _Obj(Normal=None)
        return c

    def GetActiveViewOrCreate(self, _):
        return self.view

    def Show(self, stage, view):
        self.log.append(("show", stage.kind))
        return self.disp

    def ColorBy(self, disp, spec):
        self.log.append(("colorby", spec))

    def GetColorTransferFunction(self, name):
        self.log.append(("lut", name))
        return self.lut

    def SaveScreenshot(self, out, view):
        self.log.append(("save", out))

    def Render(self, view):
        self.log.append(("render",))

    def GetActiveCamera(self):
        return _Obj()


def test_pipeline_plain():
    pv = FakePV()
    view = pb.build_pipeline(pv, "a.vtk", clip=False)
    assert ("read", ("a.vtk",)) in pv.log
    assert ("show", "src") in pv.log
    assert ("colorby", ("POINTS", "alpha")) in pv.log
    pb.render_image(pv, view, "a.png", 256)
    assert view.ViewSize == [256, 256]
    assert ("save", "a.png") in pv.log


def test_pipeline_threshold_and_clip_order():
    pv = FakePV()
    pb.build_pipeline(pv, "a.vtk", clip=True, threshold=(3.0, 9.0))
    kinds = [e[0] for e in pv.log]
    # threshold before clip (reference threshold.py applies the scalar
    # filter on the raw reader output)
    assert kinds.index("threshold") < kinds.index("clip")
    assert ("show", "clip") in pv.log


def test_video_frames():
    pv = FakePV()
    view = pb.build_pipeline(pv, "a.vtk", clip=False)
    pb.render_video_frames(pv, view, "out", frames=4, resolution=128)
    saves = [e for e in pv.log if e[0] == "save"]
    assert [s[1] for s in saves] == [f"out_{k:04d}.png" for k in range(4)]


def test_cli_exits_cleanly_without_paraview(monkeypatch):
    # force the import failure: in an environment that DOES ship ParaView,
    # main() would otherwise proceed past the import and fail differently
    import sys

    monkeypatch.setitem(sys.modules, "paraview", None)
    monkeypatch.setitem(sys.modules, "paraview.simple", None)
    with pytest.raises(SystemExit) as ei:
        pb.main(["missing.vtk"])
    assert "paraview.simple" in str(ei.value)
