"""Plan inspection: assert the physical plan is the one you designed."""
