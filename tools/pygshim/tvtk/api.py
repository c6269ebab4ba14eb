class _Unavailable:
    def __getattr__(self, name):
        raise NotImplementedError("tvtk stub: 3D vtk export not available")

    def __call__(self, *a, **k):
        raise NotImplementedError("tvtk stub: 3D vtk export not available")


tvtk = _Unavailable()


def write_data(*args, **kwargs):
    raise NotImplementedError("tvtk stub: 3D vtk export not available")
