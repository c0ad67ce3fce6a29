"""Molecular featurisation over a molecule PROTOCOL (RDKit optional).

Re-implementation of the reference featuriser
(kgcn/preprocessing/utils.py:20-175): the default 81-dim atom feature vector
(44 atom types + 17 degree one-hot + 7 implicit valence + charge + radical
electrons + 5 hybridisation + aromatic + 5 numH), adjacency with self loops,
Morgan fingerprints, and the deepchem-75 compat mode (drop degree dims 11-16
and the charge/radical slots — chem.py:554-558).

Every entry point duck-types against the atom/molecule getter protocol
(``GetSymbol/GetDegree/GetImplicitValence/…``) that BOTH RDKit mols and the
dependency-free :mod:`kgcn_tpu.data.molparse` molecules implement, so the
full chemistry pipeline runs without RDKit.  When RDKit is importable it is
preferred for SMILES/SDF parsing (richer sanitisation + Gasteiger charges);
otherwise :func:`parse_molecules` falls back to molparse transparently.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

ATOM_LIST = [
    "C", "N", "O", "S", "F", "Si", "P", "Cl", "Br", "Mg", "Na", "Ca", "Fe",
    "As", "Al", "I", "B", "V", "K", "Tl", "Yb", "Sb", "Sn", "Ag", "Pd", "Co",
    "Se", "Ti", "Zn", "H", "Li", "Ge", "Cu", "Au", "Ni", "Cd", "In", "Mn",
    "Zr", "Cr", "Pt", "Hg", "Pb", "Unknown",
]
DEGREE_DIM = 17
VALENCE_SET = [0, 1, 2, 3, 4, 5, 6]
NUM_H_SET = [0, 1, 2, 3, 4]
FEATURE_DIM = len(ATOM_LIST) + DEGREE_DIM + len(VALENCE_SET) + 2 + 5 + 1 + len(NUM_H_SET)  # 81

# Pauling electronegativity indexed by atomic number (index 0 = H); elements
# without a tabulated value (noble gases, heavy actinides) carry 0.0.  The
# reference loads the same per-atomic-number table and indexes it with
# ``en_list[atom.GetAtomicNum() - 1]`` (kgcn/preprocessing/utils.py:44-45).
PAULING_EN = np.array([
    2.20, 0.00,                                                  # H He
    0.98, 1.57, 2.04, 2.55, 3.04, 3.44, 3.98, 0.00,              # Li..Ne
    0.93, 1.31, 1.61, 1.90, 2.19, 2.58, 3.16, 0.00,              # Na..Ar
    0.82, 1.00, 1.36, 1.54, 1.63, 1.66, 1.55, 1.83, 1.88, 1.91,  # K..Ni
    1.90, 1.65, 1.81, 2.01, 2.18, 2.55, 2.96, 3.00,              # Cu..Kr
    0.82, 0.95, 1.22, 1.33, 1.60, 2.16, 1.90, 2.20, 2.28, 2.20,  # Rb..Pd
    1.93, 1.69, 1.78, 1.96, 2.05, 2.10, 2.66, 2.60,              # Ag..Xe
    0.79, 0.89, 1.10, 1.12, 1.13, 1.14, 1.13, 1.17, 1.20, 1.20,  # Cs..Gd
    1.10, 1.22, 1.23, 1.24, 1.25, 1.10, 1.27,                    # Tb..Lu
    1.30, 1.50, 2.36, 1.90, 2.20, 2.20, 2.28, 2.54,              # Hf..Au
    2.00, 1.62, 2.33, 2.02, 2.00, 2.20, 0.00,                    # Hg..At (Rn=0)
], dtype=np.float32)


def _maybe_rdkit():
    try:
        from rdkit import Chem  # noqa: F401

        return Chem
    except ImportError:
        return None


def one_of_k(x, allowable: Sequence, unk: bool = True) -> List[bool]:
    """One-hot with optional unknown-bucket-last semantics
    (kgcn/preprocessing/utils.py:83-94)."""
    if x not in allowable:
        if not unk:
            raise ValueError(f"{x} not in {allowable}")
        x = allowable[-1]
    return [x == s for s in allowable]


# SYBYL atom-type vocabulary — the reference's exact list order
# (kgcn/preprocessing/utils.py:25-28); 'Unknown' is the unk bucket, so types
# the typer emits that are missing from the list (e.g. 'P.3') land there,
# matching the reference encoder's bucketing.  The typer itself is a
# functional equivalent of oddt's _sybyl_atom_type (graph-context rules, not
# a bit-for-bit reimplementation — see PARITY.md).
SYBYL_LIST = [
    "C.ar", "C.cat", "C.1", "C.2", "C.3", "N.ar", "N.am", "N.pl3", "N.1",
    "N.2", "N.3", "N.4", "O.co2", "O.2", "O.3", "S.O", "S.o2", "S.2", "S.3",
    "F", "Si", "P", "P3", "Cl", "Br", "Mg", "Na", "Ca", "Fe", "As", "Al",
    "I", "B", "V", "K", "Tl", "Yb", "Sb", "Sn", "Ag", "Pd", "Co", "Se",
    "Ti", "Zn", "H", "Li", "Ge", "Cu", "Au", "Ni", "Cd", "In", "Mn", "Zr",
    "Cr", "Pt", "Hg", "Pb", "Unknown",
]

_HYB_SUFFIX = {"SP": 1, "SP2": 2, "SP3": 3, "SP3D": 3, "SP3D2": 3}


def _neighbor_bonds(atom):
    """[(other_atom, order)] with order 1/2/3 and 1.5 for aromatic —
    duck-typed over RDKit atoms and molparse atoms (which store bonds on the
    molecule with the aromatic sentinel 12)."""
    if hasattr(atom, "GetBonds"):  # RDKit
        out = []
        for b in atom.GetBonds():
            out.append((b.GetOtherAtom(atom), float(b.GetBondTypeAsDouble())))
        return out
    mol, i = atom._mol, atom.idx
    out = []
    for a, b, order in mol.bonds:
        if a == i or b == i:
            j = b if a == i else a
            out.append((mol.atoms[j], 1.5 if order == 12 else float(order)))
    return out


def sybyl_atom_type(atom) -> str:
    """Tripos SYBYL atom type from graph context — functional equivalent of
    oddt's pure-RDKit ``_sybyl_atom_type`` the reference imports
    (kgcn/preprocessing/utils.py:4,23), reimplemented over the molecule
    protocol so it runs RDKit/oddt-free: aromatic carbons → C.ar,
    guanidinium carbon → C.cat, amide nitrogen → N.am, planar 3-coordinate
    N → N.pl3, carboxylate/phosphate terminal O → O.co2, sulfoxide → S.O,
    sulfone → S.o2; everything else ``symbol.hybridisation``."""
    z = atom.GetAtomicNum()
    sym = atom.GetSymbol()
    hyb = _HYB_SUFFIX.get(str(atom.GetHybridization()), 3)
    nbrs = _neighbor_bonds(atom)

    def dot(suffix):
        return f"{sym}.{suffix}"

    if z == 6:
        if atom.GetIsAromatic():
            return "C.ar"
        n_nbrs = [a for a, _ in nbrs if a.GetAtomicNum() == 7]
        if (atom.GetDegree() == 3 and len(n_nbrs) == 3
                and all(a.GetDegree() <= 3 for a in n_nbrs)):
            return "C.cat"  # guanidinium-like carbon
        return dot(hyb)
    if z == 7:
        if atom.GetIsAromatic():
            return "N.ar"
        for a, order in nbrs:
            if a.GetAtomicNum() == 6 and order == 1:
                # amide N: single-bonded to a carbonyl/thiocarbonyl carbon
                for a2, o2 in _neighbor_bonds(a):
                    if o2 == 2 and a2.GetAtomicNum() in (8, 16):
                        return "N.am"
        if atom.GetDegree() == 4 or (hyb == 3 and atom.GetFormalCharge() > 0):
            # oddt gates N.4 on degree-4 OR (sp3 AND positive charge); an
            # sp2 N+ (nitro, iminium) must NOT land here
            return "N.4"
        if atom.GetDegree() == 3 and hyb == 2 and all(
                o == 1 for _, o in nbrs):
            return "N.pl3"  # planar 3-coordinate (conjugated) N
        return dot(hyb)
    if z == 8:
        # carboxylate / (thio)phosphate terminal oxygen: O with one heavy
        # neighbour C/P/S that carries another terminal O
        if atom.GetDegree() == 1 and nbrs:
            center, _ = nbrs[0]
            if center.GetAtomicNum() in (6, 15):
                terminal_o = [
                    a for a, _ in _neighbor_bonds(center)
                    if a.GetAtomicNum() == 8 and a.GetDegree() == 1
                ]
                if len(terminal_o) >= 2:
                    return "O.co2"
        if any(o == 2 for _, o in nbrs) or hyb == 2:
            return "O.2"
        return "O.3"
    if z == 16:
        term_o = [a for a, o in nbrs
                  if a.GetAtomicNum() == 8 and o == 2 and a.GetDegree() == 1]
        if len(term_o) == 1:
            return "S.O"
        if len(term_o) >= 2:
            return "S.o2"
        if any(o == 2 for _, o in nbrs):
            return "S.2"
        return "S.3"
    if z == 15:
        return dot(hyb)  # 'P.3' — lands in the Unknown bucket like oddt's
    if z == 1 or z > 16 or sym in ("F", "Cl", "Br", "I", "B", "Si"):
        return sym
    return sym


# GAFF atom-type vocabulary — the reference's exact list order
# (kgcn/preprocessing/utils.py:57-62).  In ``--use-gaff`` mode the one-hot
# over this list IS the whole feature vector (the reference's
# mol_gaff_features replaces atom_features entirely; chem.py:139-140
# "Cannot be used at the same time as the other features").
GAFF_LIST = [
    "c", "c1", "c2", "c3", "ca", "cp", "cq", "cc", "cd", "ce", "cf", "cg",
    "ch", "cx", "cy", "cu", "cv", "cz",
    "h1", "h2", "h3", "h4", "h5", "ha", "hc", "hn", "ho", "hp", "hs", "hw",
    "hx", "f", "cl", "br", "i", "n", "n1",
    "n2", "n3", "n4", "na", "nb", "nc", "nd", "ne", "nf", "nh", "no", "o",
    "oh", "os", "ow", "p2", "p3", "p4", "p5",
    "pb", "pc", "pd", "pe", "pf", "px", "py", "s", "s2", "s4", "s6", "sh",
    "ss", "sx", "sy",
]


def _ring_size(atom) -> int:
    """Smallest ring containing the atom (0 = acyclic), duck-typed over
    RDKit atoms and molparse atoms (cycle basis cached on the molecule)."""
    if hasattr(atom, "IsInRing"):  # RDKit
        if not atom.IsInRing():
            return 0
        for size in range(3, 10):
            if atom.IsInRingSize(size):
                return size
        return 10
    mol, i = atom._mol, atom.idx
    rings = getattr(mol, "_ring_cache", None)
    if rings is None:
        from kgcn_tpu.data.molparse import _cycle_basis

        rings = _cycle_basis(
            len(mol.atoms), [(a, b) for a, b, _ in mol.bonds]
        )
        try:
            mol._ring_cache = rings
        except Exception:
            pass
    sizes = [len(r) for r in rings if i in r]
    return min(sizes) if sizes else 0


def _atom_index(atom) -> int:
    return atom.GetIdx() if hasattr(atom, "GetIdx") else atom.idx


def _owning_mol(atom):
    if hasattr(atom, "GetOwningMol"):
        return atom.GetOwningMol()
    return atom._mol


def _mol_graph(mol):
    """(n_atoms, [(i, j, order)]) with aromatic order 1.5 — duck-typed."""
    if hasattr(mol, "GetBonds") and hasattr(mol, "GetNumAtoms"):  # RDKit
        return mol.GetNumAtoms(), [
            (b.GetBeginAtomIdx(), b.GetEndAtomIdx(),
             float(b.GetBondTypeAsDouble()))
            for b in mol.GetBonds()
        ]
    return len(mol.atoms), [
        (a, b, 1.5 if o == 12 else float(o)) for a, b, o in mol.bonds
    ]


def _mol_rings(mol):
    """List of atom-index rings (smallest set for RDKit, cycle basis for
    molparse), cached on the molecule."""
    cached = getattr(mol, "_gaff_rings", None)
    if cached is not None:
        return cached
    if hasattr(mol, "GetRingInfo"):  # RDKit
        rings = [tuple(r) for r in mol.GetRingInfo().AtomRings()]
    else:
        from kgcn_tpu.data.molparse import _cycle_basis

        n, bonds = _mol_graph(mol)
        rings = [tuple(r) for r in _cycle_basis(
            n, [(i, j) for i, j, _ in bonds])]
    try:
        mol._gaff_rings = rings
    except Exception:
        pass
    return rings


_GAFF_CONJ_MEMO: dict = {}


def _gaff_conj(mol):
    """Kekulé-alternation colors for GAFF conjugation type pairs.

    Returns ``(colors, cp_set)``: ``colors[i] in (0, 1)`` for atoms in the
    split-typed conjugated systems (0 → the first letter of the pair:
    cc/ce/nc/ne; 1 → cd/cf/nd/nf), and ``cp_set`` = ipso carbons of
    biphenyl-type aromatic–aromatic single bridges.

    GAFF's pair law (gaff.dat bond table: cc-cc 1.43 Å single vs cc-cd
    1.37 Å double): bonds between SAME types are conjugated single bonds,
    bonds between DIFFERENT types are the Kekulé double bonds — so colors
    flip across double bonds and persist across single/aromatic ones.  For
    aromatic 5-rings (RDKit/molparse give order-1.5 bonds, no Kekulé
    structure) the double-bond set is recovered with a greedy matching over
    the double-bond-capable ring atoms (aromatic C; 2-connected aromatic
    N) — exact on the 5-ring heteroaromatics this path serves (pyrrole,
    furan, thiophene, imidazole, ...), since the pyrrole-type heteroatom
    pins the alternation.  Reference behavior being reproduced: openbabel's
    GAFF typer via kgcn/preprocessing/utils.py:57-79.
    """
    cached = getattr(mol, "_gaff_conj_cache", None)
    if cached is not None:
        return cached
    n, bonds = _mol_graph(mol)
    atoms = ([mol.GetAtomWithIdx(i) for i in range(n)]
             if hasattr(mol, "GetAtomWithIdx") else list(mol.atoms))
    # the attribute cache above is identity-based and only helps backends
    # whose owning-mol object is stable (molparse); RDKit's GetOwningMol
    # returns a FRESH wrapper per call, so per-atom typing would recompute
    # this per atom.  Memo on the exact graph signature the function reads
    # (elements, aromaticity, H-inclusive degree, bonds+orders) instead.
    sig = (n, tuple(bonds), tuple(
        (a.GetAtomicNum(), bool(a.GetIsAromatic()),
         a.GetDegree() + a.GetTotalNumHs())
        for a in atoms
    ))
    hit = _GAFF_CONJ_MEMO.get(sig)
    if hit is not None:
        try:  # stable-mol backends skip even the signature build next call
            mol._gaff_conj_cache = hit
        except Exception:
            pass
        return hit
    rings = _mol_rings(mol)
    ring_sizes = [set() for _ in range(n)]
    for r in rings:
        for i in r:
            ring_sizes[i].add(len(r))
    in_ring = [bool(ring_sizes[i]) for i in range(n)]

    def aromatic(i):
        return bool(atoms[i].GetIsAromatic())

    adj = [[] for _ in range(n)]
    for i, j, o in bonds:
        adj[i].append((j, o))
        adj[j].append((i, o))

    def has_multiple(i):
        return any(o >= 1.5 for _, o in adj[i])

    # --- candidates -----------------------------------------------------
    # ring family: aromatic atom whose rings are 5-membered only (fused
    # 5+6 atoms stay pure-aromatic ca, like antechamber's indole fusion
    # carbons); C always capable, N only when 2-connected (pyridine-type)
    ring_cand = set()
    for i in range(n):
        if not aromatic(i) or 6 in ring_sizes[i] or 5 not in ring_sizes[i]:
            continue
        z = atoms[i].GetAtomicNum()
        if z == 6:
            ring_cand.add(i)
        elif z == 7 and (atoms[i].GetDegree()
                         + atoms[i].GetTotalNumHs()) == 2:
            ring_cand.add(i)
    # chain family: non-ring sp2 C/N carrying a double bond, single-bonded
    # to another atom that itself carries a multiple bond ("inner" atom of
    # a conjugated chain — terminal =CH2 stays c2/n2)
    chain_cand = set()
    for i in range(n):
        if in_ring[i] or atoms[i].GetAtomicNum() not in (6, 7):
            continue
        if not any(o == 2 for _, o in adj[i]):
            continue
        if any(o == 1 and (has_multiple(j) or aromatic(j))
               for j, o in adj[i]):
            chain_cand.add(i)
    cand = ring_cand | chain_cand

    # --- Kekulé double-bond set ----------------------------------------
    matched = set()   # frozenset({i, j}) double bonds between candidates
    taken = set()
    for i, j, o in bonds:
        if o == 2 and i in cand and j in cand:
            matched.add(frozenset((i, j)))
            taken.update((i, j))
    # leaf-first greedy maximum matching over the aromatic candidate
    # subgraph (exact on the paths/cycles these 5-ring systems form —
    # matching lowest-index-first instead can strand mid-path atoms and
    # produce an invalid Kekulé pattern)
    live = {i for i in ring_cand if i not in taken}
    sub = {i: [j for j, o in adj[i] if o == 1.5 and j in live]
           for i in live}
    while live:
        i = min(live, key=lambda a: (len([j for j in sub[a] if j in live]),
                                     a))
        nbrs_live = [j for j in sub[i] if j in live]
        live.discard(i)
        if not nbrs_live:
            continue  # odd-component leftover: stays single-bonded
        j = nbrs_live[0]
        matched.add(frozenset((i, j)))
        live.discard(j)

    # --- 2-coloring -----------------------------------------------------
    # start each component at a heteroatom-adjacent candidate (alpha
    # position) with color 0 → pyrrole/furan alphas get the first letter
    # (cc), matching antechamber's conventional output
    def start_key(i):
        alpha = any(
            o == 1.5 and j not in cand and aromatic(j)
            and atoms[j].GetAtomicNum() != 6
            for j, o in adj[i]
        )
        return (0 if alpha else 1, i)

    colors: dict = {}
    for start in sorted(cand, key=start_key):
        if start in colors:
            continue
        colors[start] = 0
        stack = [start]
        while stack:
            i = stack.pop()
            for j, o in adj[i]:
                if j not in cand or j in colors:
                    continue
                flip = frozenset((i, j)) in matched
                colors[j] = colors[i] ^ int(flip)
                stack.append(j)

    # --- biphenyl bridges (cp) -----------------------------------------
    ring_sets = [frozenset(r) for r in rings]
    cp_set = set()
    for i, j, o in bonds:
        if (aromatic(i) and aromatic(j)
                and atoms[i].GetAtomicNum() == 6
                and atoms[j].GetAtomicNum() == 6
                and 6 in ring_sizes[i] and 6 in ring_sizes[j]
                and not any(i in rs and j in rs for rs in ring_sets)):
            cp_set.update((i, j))

    out = (colors, cp_set)
    if len(_GAFF_CONJ_MEMO) > 4096:  # bound the memo for huge corpora
        _GAFF_CONJ_MEMO.clear()
    _GAFF_CONJ_MEMO[sig] = out
    try:
        mol._gaff_conj_cache = out
    except Exception:
        pass
    return out


def gaff_atom_type(atom) -> str:
    """GAFF atom type from graph context — functional equivalent of the
    reference's openbabel force-field typer (kgcn/preprocessing/utils.py:
    57-79, ``pybel._forcefields["gaff"]``), reimplemented over the molecule
    protocol so it runs openbabel-free.

    Covers the common organic subset exactly (c/c1/c2/c3/ca/cx/cy/cu/cv/cz,
    n/n1/n2/n3/n4/na/nb/nh/no, o/oh/os, s/s2/s4/s6/sh/ss, p2/p3/p5, f/cl/
    br/i, and the hydrogen classes for explicit-H molecules) plus, since
    round 5, the conjugation splittings via Kekulé-alternation coloring
    (``_gaff_conj``): 5-ring heteroaromatic carbons cc/cd, conjugated-chain
    inners ce/cf and ne/nf, 5-ring pyridine-type nitrogens nc/nd, and
    biphenyl-bridge cp.  Still approximated (documented in PARITY.md):
    cq (special fused-bridge variant) → cp; cg/ch conjugated sp1 → c1;
    fused 5+6 ring atoms → ca (antechamber's indole behavior);
    pb/pc-pf/px/py/sx/sy conjugation variants → base type.  Unknown
    exotics fall into the reference's unk-last bucket ('sy')."""
    z = atom.GetAtomicNum()
    nbrs = _neighbor_bonds(atom)
    deg = atom.GetDegree()
    hyb = _HYB_SUFFIX.get(str(atom.GetHybridization()), 3)
    ring = _ring_size(atom)
    orders = [o for _, o in nbrs]

    if z == 1:  # explicit hydrogens
        if not nbrs:
            return "hc"
        a, _ = nbrs[0]
        az = a.GetAtomicNum()
        if az == 7:
            return "hn"
        if az == 8:
            return "ho"
        if az == 16:
            return "hs"
        if az == 15:
            return "hp"
        if az == 6:
            ew = sum(1 for b, _ in _neighbor_bonds(a)
                     if b.GetAtomicNum() in (7, 8, 9, 16, 17, 35, 53))
            if a.GetIsAromatic():
                return {0: "ha", 1: "h4", 2: "h5"}.get(min(ew, 2), "h5")
            return {0: "hc", 1: "h1", 2: "h2", 3: "h3"}.get(min(ew, 3), "h3")
        return "hc"
    if z == 6:
        if atom.GetIsAromatic():
            colors, cp_set = _gaff_conj(_owning_mol(atom))
            i = _atom_index(atom)
            if i in cp_set:
                return "cp"  # biphenyl ipso (cq fused variant → cp)
            if i in colors:
                return "cc" if colors[i] == 0 else "cd"
            return "ca"
        if any(o == 2 and a.GetAtomicNum() in (8, 16) for a, o in nbrs):
            return "c"  # carbonyl / thiocarbonyl
        if hyb == 1 or any(o == 3 for o in orders):
            return "c1"
        if hyb == 2:
            n_nbrs = [a for a, _ in nbrs if a.GetAtomicNum() == 7]
            if deg == 3 and len(n_nbrs) == 3:
                return "cz"  # guanidinium
            if ring == 3:
                return "cu"
            if ring == 4:
                return "cv"
            colors, _ = _gaff_conj(_owning_mol(atom))
            i = _atom_index(atom)
            if i in colors:
                return "ce" if colors[i] == 0 else "cf"
            return "c2"
        if ring == 3:
            return "cx"
        if ring == 4:
            return "cy"
        return "c3"
    if z == 7:
        o_term = [a for a, _ in nbrs
                  if a.GetAtomicNum() == 8 and a.GetDegree() == 1]
        if len(o_term) >= 2:
            return "no"  # nitro
        if atom.GetIsAromatic():
            # pyrrole-like (3 connections incl. implicit H) → na;
            # 5-ring pyridine-like → nc/nd; 6-ring pyridine-like → nb
            if deg + atom.GetTotalNumHs() >= 3:
                return "na"
            colors, _ = _gaff_conj(_owning_mol(atom))
            i = _atom_index(atom)
            if i in colors:
                return "nc" if colors[i] == 0 else "nd"
            return "nb"
        for a, order in nbrs:
            if a.GetAtomicNum() == 6 and order == 1:
                for a2, o2 in _neighbor_bonds(a):
                    if o2 == 2 and a2.GetAtomicNum() in (8, 16):
                        return "n"  # amide
        if hyb == 1 or any(o == 3 for o in orders):
            return "n1"
        if deg == 4 or (hyb == 3 and atom.GetFormalCharge() > 0):
            return "n4"
        if any(o == 2 for o in orders):
            colors, _ = _gaff_conj(_owning_mol(atom))
            i = _atom_index(atom)
            if i in colors:
                return "ne" if colors[i] == 0 else "nf"
            return "n2"
        if any(a.GetIsAromatic() for a, _ in nbrs):
            return "nh"  # aniline-like amine
        return "n3"
    if z == 8:
        if any(o == 2 for o in orders) or (deg == 1 and hyb == 2):
            return "o"
        if deg == 1 and atom.GetFormalCharge() < 0:
            return "o"  # carboxylate/phenolate terminal O
        if atom.GetTotalNumHs() > 0:
            return "oh"
        return "os"
    if z == 16:
        o_dbl = sum(1 for a, o in nbrs
                    if o == 2 and a.GetAtomicNum() == 8)
        if o_dbl >= 2:
            return "s6"  # sulfone / sulfate
        if o_dbl == 1 and deg >= 3:
            return "s4"  # sulfoxide
        if any(o == 2 for o in orders):
            return "s2" if deg >= 2 else "s"
        if atom.GetIsAromatic():
            return "ss"  # thiophene-type S: two single bonds in the ring
        if atom.GetTotalNumHs() > 0:
            return "sh"
        return "ss"
    if z == 15:
        o_dbl = sum(1 for a, o in nbrs
                    if o == 2 and a.GetAtomicNum() == 8)
        if deg >= 4 or o_dbl >= 1:
            return "p5"  # phosphate-like
        if hyb == 2 and deg == 2:
            return "p2"
        return "p3"
    if z == 9:
        return "f"
    if z == 17:
        return "cl"
    if z == 35:
        return "br"
    if z == 53:
        return "i"
    return atom.GetSymbol().lower()  # exotics → unk-last bucket


def mol_gaff_features(mol) -> np.ndarray:
    """[N, 71] GAFF one-hot feature matrix — the reference's
    ``mol_gaff_features`` (kgcn/preprocessing/utils.py:57-79) without
    openbabel.  Types outside the vocabulary land in the unk-last bucket,
    mirroring ``one_of_k_encoding_unk``."""
    return np.stack([
        np.asarray(one_of_k(gaff_atom_type(a), GAFF_LIST), np.float32)
        for a in mol.GetAtoms()
    ])


def atom_features(atom, degree_dim: int = DEGREE_DIM, *,
                  use_electronegativity: bool = False,
                  use_gasteiger: bool = False,
                  use_sybyl: bool = False) -> np.ndarray:
    """Default 81-dim feature vector (kgcn/preprocessing/utils.py:20-56).

    Optional scalar extensions match the reference's insertion point — after
    the aromatic flag, before the numH one-hot (utils.py:44-51):
    ``use_electronegativity`` appends the element's Pauling EN;
    ``use_gasteiger`` appends the precomputed ``_GasteigerCharge`` property
    (NaN/inf → 0, "because the mean is 0").  ``use_sybyl`` replaces the
    44-symbol one-hot with the 60-type SYBYL one-hot (utils.py:22-28),
    typed by :func:`sybyl_atom_type` (no oddt needed).  GAFF typing stays
    out of scope — it needs openbabel's force-field engine even in the
    reference (utils.py:59-61).
    """
    # compare hybridisation by NAME so RDKit enums ("SP2") and molparse
    # strings interop through the same one-hot
    hyb_names = ["SP", "SP2", "SP3", "SP3D", "SP3D2"]
    if use_sybyl:
        type_onehot = one_of_k(sybyl_atom_type(atom), SYBYL_LIST)
    else:
        type_onehot = one_of_k(atom.GetSymbol(), ATOM_LIST)
    feats = (
        type_onehot
        + one_of_k(atom.GetDegree(), list(range(degree_dim)), unk=False)
        + one_of_k(atom.GetImplicitValence(), VALENCE_SET)
        + [atom.GetFormalCharge(), atom.GetNumRadicalElectrons()]
        + one_of_k(str(atom.GetHybridization()), hyb_names)
        + [atom.GetIsAromatic()]
    )
    if use_electronegativity:
        z = atom.GetAtomicNum()
        feats = feats + [float(PAULING_EN[z - 1]) if 0 < z <= len(PAULING_EN) else 0.0]
    if use_gasteiger:
        g = float(atom.GetDoubleProp("_GasteigerCharge"))
        if not np.isfinite(g):
            g = 0.0
        feats = feats + [g]
    feats = feats + one_of_k(atom.GetTotalNumHs(), NUM_H_SET)
    return np.array(feats, dtype=np.float32)


def adjacency_matrix(mol) -> np.ndarray:
    """Adjacency + self loops (kgcn/preprocessing/utils.py:147-153);
    duck-typed: molparse molecules carry their own adjacency."""
    if hasattr(mol, "adjacency_matrix"):
        adj = mol.adjacency_matrix()
    else:
        from rdkit import Chem

        adj = np.array(Chem.GetAdjacencyMatrix(mol), dtype=np.int8)
    np.fill_diagonal(adj, 1)
    return adj


def mol_to_graph(mol, atom_num_limit: int, deepchem_compat: bool = False, *,
                 use_electronegativity: bool = False,
                 use_gasteiger: bool = False,
                 use_sybyl: bool = False,
                 use_gaff: bool = False):
    """One molecule → (padded feature [N, F], adjacency dense [n, n]) or None
    if it exceeds the atom limit (kgcn/preprocessing/chem.py atom filter)."""
    n = mol.GetNumAtoms()
    if n > atom_num_limit:
        return None
    if use_gaff:
        # GAFF mode REPLACES the whole feature vector with the 71-type
        # one-hot (reference create_feature_matrix, utils.py:156-161)
        feats = mol_gaff_features(mol)
        padded = np.zeros((atom_num_limit, feats.shape[1]), np.float32)
        padded[:n] = feats
        return padded, adjacency_matrix(mol)
    if use_gasteiger:
        if hasattr(mol, "adjacency_matrix"):
            raise ValueError(
                "--use-gasteiger requires RDKit molecules (Gasteiger "
                "charge iteration is not implemented in molparse)"
            )
        from rdkit.Chem.rdPartialCharges import ComputeGasteigerCharges

        ComputeGasteigerCharges(mol)
    feats = np.stack([
        atom_features(a, use_electronegativity=use_electronegativity,
                      use_gasteiger=use_gasteiger, use_sybyl=use_sybyl)
        for a in mol.GetAtoms()
    ])
    type_dim = len(SYBYL_LIST) if use_sybyl else len(ATOM_LIST)
    if deepchem_compat:
        # 75-dim deepchem mode: degree one-hot truncated to 11, drop
        # charge/radical slots (chem.py:554-558)
        keep = (
            list(range(type_dim + 11))
            + list(range(type_dim + 17, type_dim + 17 + 7))
            + list(range(type_dim + 17 + 7 + 2, feats.shape[1]))
        )
        feats = feats[:, keep]
    padded = np.zeros((atom_num_limit, feats.shape[1]), np.float32)
    padded[:n] = feats
    return padded, adjacency_matrix(mol)


def morgan_fingerprint(mol, radius: int = 2, bits: int = 2048) -> np.ndarray:
    """Morgan/ECFP bit vector (kgcn/preprocessing/chem.py:720-727).
    molparse molecules use the pure-Python circular-hash fallback."""
    if hasattr(mol, "adjacency_matrix"):
        from kgcn_tpu.data import molparse

        return molparse.morgan_fingerprint(mol, radius=radius, bits=bits)
    from rdkit.Chem import AllChem

    fp = AllChem.GetMorganFingerprintAsBitVect(mol, radius, nBits=bits)
    return np.asarray(fp, dtype=np.float32)


def parse_molecules(smiles: Optional[Sequence[str]] = None,
                    sdf_path: Optional[str] = None,
                    smarts: Optional[Sequence[str]] = None,
                    backend: str = "auto"):
    """SMILES list / SDF file / SMARTS list → list of mols (None kept for
    unparseable entries so labels stay aligned).

    ``backend``: "auto" prefers RDKit when importable and falls back to the
    dependency-free molparse parser; "rdkit"/"molparse" force one.  SMARTS
    pattern queries genuinely need RDKit.
    """
    Chem = _maybe_rdkit() if backend in ("auto", "rdkit") else None
    if backend == "rdkit" and Chem is None:
        raise ImportError("RDKit is required for backend='rdkit'")
    if Chem is not None:
        if smiles is not None:
            return [Chem.MolFromSmiles(s) for s in smiles]
        if smarts is not None:
            return [Chem.MolFromSmarts(s) for s in smarts]
        if sdf_path is not None:
            return list(Chem.SDMolSupplier(sdf_path))
    else:
        from kgcn_tpu.data import molparse

        if smiles is not None:
            return [molparse.parse_smiles(s) for s in smiles]
        if smarts is not None:
            raise ImportError("SMARTS parsing requires RDKit")
        if sdf_path is not None:
            return molparse.parse_sdf(sdf_path)
    raise ValueError("one of smiles/sdf_path/smarts required")


def build_chem_dataset(
    mols,
    labels: Optional[np.ndarray] = None,
    mask_label: Optional[np.ndarray] = None,
    atom_num_limit: int = 50,
    *,
    deepchem_compat: bool = False,
    use_electronegativity: bool = False,
    use_gasteiger: bool = False,
    use_sybyl: bool = False,
    use_gaff: bool = False,
    with_fingerprint: bool = False,
    sequences: Optional[np.ndarray] = None,
    sequence_symbol_num: Optional[int] = None,
    vector_modal: Optional[np.ndarray] = None,
    generate_mol_info: bool = True,
):
    """Assemble the jbl-schema dict from RDKit mols + aligned label arrays
    (reference: kgcn/preprocessing/chem.py:552-770).  Skips molecules that
    fail parsing or exceed ``atom_num_limit`` — labels are filtered in sync.
    """
    feats, adjs, keep = [], [], []
    for i, mol in enumerate(mols):
        if mol is None:
            continue
        if not hasattr(mol, "adjacency_matrix"):  # RDKit mol
            try:
                from rdkit import Chem

                Chem.SanitizeMol(mol, catchErrors=True)
            except Exception:
                pass
        out = mol_to_graph(mol, atom_num_limit, deepchem_compat,
                           use_sybyl=use_sybyl,
                           use_electronegativity=use_electronegativity,
                           use_gasteiger=use_gasteiger,
                           use_gaff=use_gaff)
        if out is None:
            continue
        f, a = out
        feats.append(f)
        adjs.append(a)
        keep.append(i)
    keep = np.asarray(keep, dtype=np.int64)
    n = len(keep)
    max_n = atom_num_limit
    data = {
        "feature": np.stack(feats) if n else np.zeros(
            (0, max_n,
             (75 if deepchem_compat else FEATURE_DIM)
             + int(use_electronegativity) + int(use_gasteiger))),
        "adj": [
            (
                np.stack(np.nonzero(a), axis=1).astype(np.int32),
                a[np.nonzero(a)].astype(np.float32),
                # the COO shape carries the TRUE atom count (the reference
                # does the same) — build_dataset reads enabled_node_nums
                # from it; writing the padding limit here would mark every
                # padding row as a valid node
                a.shape,
            )
            for a in adjs
        ],
        "max_node_num": np.int64(max_n),
    }
    if labels is not None:
        labels = np.asarray(labels)[keep]
        data["label"] = labels
        if mask_label is not None:
            data["mask_label"] = np.asarray(mask_label)[keep]
        else:
            # NaN labels → masked slots (chem.py:436-490 assay-matrix mode)
            mask = (~np.isnan(labels.astype(np.float64))).astype(np.int64)
            data["mask_label"] = mask
            data["label"] = np.nan_to_num(labels)
    if sequences is not None:
        seqs = np.asarray(sequences)[keep]
        data["sequence"] = seqs.astype(np.int32)
        data["sequence_length"] = [int((s != 0).sum()) for s in seqs]
        data["sequence_symbol_num"] = np.int64(
            sequence_symbol_num or int(seqs.max()) + 1
        )
    if vector_modal is not None:
        data["vector_modal"] = np.asarray(vector_modal)[keep].astype(np.float32)
    if with_fingerprint:
        data["chemical_fp"] = np.stack(
            [morgan_fingerprint(mols[i]) for i in keep]
        )
    if generate_mol_info:
        data["mol_info"] = {
            "obj_list": [mols[i] for i in keep],
            "index_list": keep.tolist(),
        }
    return data


def generate_pseudo_negatives(labels: np.ndarray, mask: np.ndarray,
                              seed: int = 0):
    """Balance an assay label matrix by unmasking random unlabeled
    (molecule, task) cells as negatives until actives ≈ inactives
    (reference: kgcn/preprocessing/chem.py:193-226 ``--no_pseudo_negative``
    off by default for CPI).  Mutates copies; returns (labels, mask,
    n_added).  Pure NumPy — no RDKit needed."""
    labels = np.array(labels, copy=True)
    mask = np.array(mask, copy=True)
    mi, ti = np.where(mask == 1)
    active = int((labels[mi, ti] == 1).sum())
    inactive = int((labels[mi, ti] == 0).sum())
    make = active - inactive
    if make <= 0:
        return labels, mask, 0
    rng = np.random.RandomState(seed)
    free_cells = np.argwhere(mask == 0)
    free = len(free_cells)
    if make >= free:
        # every remaining cell becomes a pseudo negative (chem.py:206-209)
        labels[mask == 0] = 0
        mask[mask == 0] = 1
        return labels, mask, free
    # exact sampling without replacement over the free cells — rejection
    # sampling over the full M×T matrix degenerates when free ≈ make
    pick = free_cells[rng.choice(free, size=make, replace=False)]
    mask[pick[:, 0], pick[:, 1]] = 1
    labels[pick[:, 0], pick[:, 1]] = 0
    return labels, mask, make


AMINO_ACIDS = "ACDEFGHIKLMNPQRSTVWY"


def encode_protein_sequence(seq: str, max_len: int) -> np.ndarray:
    """Amino-acid sequence → int codes (1..20; 0 = pad), the CPI multimodal
    sequence modality (reference: chem.py:192-269 multimodal assembly)."""
    codes = np.zeros((max_len,), np.int32)
    for i, ch in enumerate(seq[:max_len]):
        codes[i] = AMINO_ACIDS.index(ch) + 1 if ch in AMINO_ACIDS else len(AMINO_ACIDS) + 1
    return codes
