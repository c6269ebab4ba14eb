"""Import-only tvtk stub: the reference's test driver imports
`visualization3D.pv_3Dview` at module level (test.py:21,24), but the vtk
export path only runs under --plot3D. The A/B harness never sets it."""
