"""L3/L4 contact: collision objects, broad/narrow phase, barrier energies, CCD."""
