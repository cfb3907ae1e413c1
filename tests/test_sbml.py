"""SBML importer: parsed model == hand-written model; core semantics.

The reference domain ships models as SBML (BioModels/COPASI); the importer
(model/sbml_import.py) must reproduce the hand-written library models
exactly and honor SBML core semantics (local parameters, function
definitions, rules, compartment volumes, boundary species).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpusysbio.config import SolverConfig
from tpusysbio.model import library
from tpusysbio.model.sbml_import import (SbmlError, SbmlUnsupportedError,
                                         from_sbml)

MM_SBML = """<?xml version="1.0" encoding="UTF-8"?>
<sbml xmlns="http://www.sbml.org/sbml/level2/version4" level="2" version="4">
 <model id="mm3">
  <listOfCompartments>
   <compartment id="cell" size="1"/>
  </listOfCompartments>
  <listOfSpecies>
   <species id="S" compartment="cell" initialConcentration="1"/>
   <species id="C" compartment="cell" initialConcentration="0"/>
   <species id="P" compartment="cell" initialConcentration="0"/>
  </listOfSpecies>
  <listOfParameters>
   <parameter id="k1" value="30"/>
   <parameter id="km1" value="10"/>
   <parameter id="k2" value="5"/>
   <parameter id="E0" value="0.2"/>
  </listOfParameters>
  <listOfReactions>
   <reaction id="bind" reversible="false">
    <listOfReactants><speciesReference species="S"/></listOfReactants>
    <listOfProducts><speciesReference species="C"/></listOfProducts>
    <kineticLaw>
     <math xmlns="http://www.w3.org/1998/Math/MathML">
      <apply><times/><ci>k1</ci>
       <apply><minus/><ci>E0</ci><ci>C</ci></apply><ci>S</ci></apply>
     </math>
    </kineticLaw>
   </reaction>
   <reaction id="unbind" reversible="false">
    <listOfReactants><speciesReference species="C"/></listOfReactants>
    <listOfProducts><speciesReference species="S"/></listOfProducts>
    <kineticLaw>
     <math xmlns="http://www.w3.org/1998/Math/MathML">
      <apply><times/><ci>km1</ci><ci>C</ci></apply>
     </math>
    </kineticLaw>
   </reaction>
   <reaction id="cat" reversible="false">
    <listOfReactants><speciesReference species="C"/></listOfReactants>
    <listOfProducts><speciesReference species="P"/></listOfProducts>
    <kineticLaw>
     <math xmlns="http://www.w3.org/1998/Math/MathML">
      <apply><times/><ci>k2</ci><ci>C</ci></apply>
     </math>
    </kineticLaw>
   </reaction>
  </listOfReactions>
 </model>
</sbml>
"""


def test_mm_matches_handwritten_model():
    model, p0 = from_sbml(MM_SBML)
    assert model.param_names == ("k1", "km1", "k2", "E0")
    assert model.state_names == ("S", "C", "P")
    m_ref = library.michaelis_menten()
    p = jnp.asarray(library.MM_TRUE_PARAMS)
    y = jnp.asarray([0.7, 0.1, 0.2])
    np.testing.assert_allclose(np.asarray(model.rhs(0.0, y, p)),
                               np.asarray(m_ref.rhs(0.0, y, p)), rtol=1e-14)
    cfg = SolverConfig(rtol=1e-8, atol=1e-11)
    t_eval = jnp.linspace(0.0, 5.0, 6)
    ys = model.simulate(p, (0.0, 5.0), t_eval, config=cfg).ys
    ys_ref = m_ref.simulate(p, (0.0, 5.0), t_eval, config=cfg).ys
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref),
                               rtol=1e-10, atol=1e-12)
    # declared parameter values come back as the natural start point
    np.testing.assert_allclose(p0, [30.0, 10.0, 5.0, 0.2])


LOCAL_FD_SBML = """<?xml version="1.0"?>
<sbml xmlns="http://www.sbml.org/sbml/level3/version2/core"
      level="3" version="2">
 <model id="features">
  <listOfFunctionDefinitions>
   <functionDefinition id="hill">
    <math xmlns="http://www.w3.org/1998/Math/MathML">
     <lambda>
      <bvar><ci>x</ci></bvar><bvar><ci>K</ci></bvar>
      <apply><divide/><ci>x</ci>
       <apply><plus/><ci>K</ci><ci>x</ci></apply></apply>
     </lambda>
    </math>
   </functionDefinition>
  </listOfFunctionDefinitions>
  <listOfCompartments>
   <compartment id="cell" size="1" constant="true"/>
  </listOfCompartments>
  <listOfSpecies>
   <species id="A" compartment="cell" initialConcentration="2"
            boundaryCondition="false" constant="false"/>
   <species id="Inp" compartment="cell" initialConcentration="0.5"
            boundaryCondition="true" constant="false"/>
  </listOfSpecies>
  <listOfParameters>
   <parameter id="K" value="1.0" constant="true"/>
  </listOfParameters>
  <listOfReactions>
   <reaction id="deg" reversible="false">
    <listOfReactants><speciesReference species="A"/></listOfReactants>
    <kineticLaw>
     <math xmlns="http://www.w3.org/1998/Math/MathML">
      <apply><times/><ci>kdeg</ci><ci>Inp</ci>
       <apply><ci>hill</ci><ci>A</ci><ci>K</ci></apply></apply>
     </math>
     <listOfLocalParameters>
      <localParameter id="kdeg" value="3.0"/>
     </listOfLocalParameters>
    </kineticLaw>
   </reaction>
  </listOfReactions>
 </model>
</sbml>
"""


def test_local_params_fundefs_boundary_species():
    model, p0 = from_sbml(LOCAL_FD_SBML)
    # params: global K, lifted local deg__kdeg, boundary species Inp
    assert model.param_names == ("K", "deg__kdeg", "Inp")
    np.testing.assert_allclose(p0, [1.0, 3.0, 0.5])
    assert model.state_names == ("A",)
    p = jnp.asarray(p0)
    y = jnp.asarray([2.0])
    # dA/dt = -kdeg * Inp * A/(K+A) = -3*0.5*2/3 = -1
    np.testing.assert_allclose(np.asarray(model.rhs(0.0, y, p)), [-1.0],
                               rtol=1e-14)


VOLUME_SBML = """<?xml version="1.0"?>
<sbml xmlns="http://www.sbml.org/sbml/level2/version4" level="2" version="4">
 <model id="vol">
  <listOfCompartments><compartment id="cyt" size="2.0"/></listOfCompartments>
  <listOfSpecies>
   <species id="X" compartment="cyt" initialAmount="4.0"/>
  </listOfSpecies>
  <listOfParameters><parameter id="k" value="0.5"/></listOfParameters>
  <listOfReactions>
   <reaction id="dx" reversible="false">
    <listOfReactants><speciesReference species="X"/></listOfReactants>
    <kineticLaw>
     <math xmlns="http://www.w3.org/1998/Math/MathML">
      <apply><times/><ci>k</ci><ci>X</ci><ci>cyt</ci></apply>
     </math>
    </kineticLaw>
   </reaction>
  </listOfReactions>
 </model>
</sbml>
"""


def test_compartment_volume_semantics():
    """State is concentration; kinetic law is substance/time; ODE /= V."""
    model, p0 = from_sbml(VOLUME_SBML)
    p = jnp.asarray(p0)
    # initialAmount 4 in V=2 → [X]0 = 2
    np.testing.assert_allclose(np.asarray(model.y0(p)), [2.0])
    # v = k*[X]*V (amount/time) → d[X]/dt = -v/V = -k*[X] = -1.0
    np.testing.assert_allclose(
        np.asarray(model.rhs(0.0, jnp.asarray([2.0]), p)), [-1.0],
        rtol=1e-14)


RULES_SBML = """<?xml version="1.0"?>
<sbml xmlns="http://www.sbml.org/sbml/level2/version4" level="2" version="4">
 <model id="rules">
  <listOfCompartments><compartment id="c" size="1"/></listOfCompartments>
  <listOfSpecies>
   <species id="Y" compartment="c" initialConcentration="1"/>
  </listOfSpecies>
  <listOfParameters>
   <parameter id="a" value="2.0" constant="true"/>
   <parameter id="tot" value="0" constant="false"/>
   <parameter id="drive" value="1.5" constant="false"/>
  </listOfParameters>
  <listOfInitialAssignments>
   <initialAssignment symbol="Y">
    <math xmlns="http://www.w3.org/1998/Math/MathML">
     <apply><divide/><ci>a</ci><cn type="integer">4</cn></apply>
    </math>
   </initialAssignment>
  </listOfInitialAssignments>
  <listOfRules>
   <assignmentRule variable="tot">
    <math xmlns="http://www.w3.org/1998/Math/MathML">
     <apply><times/><cn>2</cn><ci>Y</ci></apply>
    </math>
   </assignmentRule>
   <rateRule variable="drive">
    <math xmlns="http://www.w3.org/1998/Math/MathML">
     <apply><minus/><ci>a</ci><ci>drive</ci></apply>
    </math>
   </rateRule>
  </listOfRules>
  <listOfReactions>
   <reaction id="grow" reversible="false">
    <listOfProducts><speciesReference species="Y"/></listOfProducts>
    <kineticLaw>
     <math xmlns="http://www.w3.org/1998/Math/MathML">
      <apply><times/><ci>tot</ci><ci>drive</ci></apply>
     </math>
    </kineticLaw>
   </reaction>
  </listOfReactions>
 </model>
</sbml>
"""


def test_rules_and_initial_assignments():
    model, p0 = from_sbml(RULES_SBML)
    # 'tot' is an assignment rule (derived), 'drive' a rate rule (state)
    assert model.param_names == ("a",)
    assert model.state_names == ("Y", "drive")
    p = jnp.asarray(p0)
    # initialAssignment: Y0 = a/4 = 0.5; rate-rule state starts at its value
    np.testing.assert_allclose(np.asarray(model.y0(p)), [0.5, 1.5])
    # dY/dt = tot*drive = (2Y)*drive; d(drive)/dt = a - drive
    y = jnp.asarray([0.5, 1.5])
    np.testing.assert_allclose(np.asarray(model.rhs(0.0, y, p)),
                               [2 * 0.5 * 1.5, 2.0 - 1.5], rtol=1e-14)


def test_unsupported_constructs_raise():
    events = MM_SBML.replace(
        "<listOfReactions>",
        "<listOfEvents><event id='e'/></listOfEvents><listOfReactions>")
    with pytest.raises(SbmlUnsupportedError):
        from_sbml(events)
    algebraic = RULES_SBML.replace(
        "<rateRule variable=\"drive\">", "<algebraicRule>").replace(
        "</rateRule>", "</algebraicRule>")
    with pytest.raises(SbmlUnsupportedError):
        from_sbml(algebraic)
    with pytest.raises(SbmlError):
        from_sbml("<notsbml/>")


def test_unknown_symbol_is_an_error():
    broken = MM_SBML.replace("<ci>km1</ci>", "<ci>typo</ci>")
    with pytest.raises(SbmlError):
        from_sbml(broken)


def test_repressilator_sbml_example_matches_library():
    """examples/repressilator.sbml.xml (rate rules + power MathML) is
    state-for-state the hand-written library model."""
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "repressilator.sbml.xml")
    model, p0 = from_sbml(path)
    ref = library.repressilator()
    assert model.param_names == ref.param_names
    assert model.state_names == ref.state_names
    np.testing.assert_allclose(p0, library.REPRESSILATOR_TRUE_PARAMS)
    p = jnp.asarray(library.REPRESSILATOR_TRUE_PARAMS)
    y = jnp.asarray([0.2, 0.15, 0.3, 0.12, 0.44, 0.53])
    np.testing.assert_allclose(np.asarray(model.rhs(0.0, y, p)),
                               np.asarray(ref.rhs(0.0, y, p)), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(model.y0(jnp.asarray(p0))),
                               np.asarray(ref.y0(p)))


def test_rule_on_constant_entity_is_an_error():
    bad = RULES_SBML.replace('<parameter id="drive" value="1.5" constant="false"/>',
                             '<parameter id="drive" value="1.5" constant="true"/>')
    with pytest.raises(SbmlError):
        from_sbml(bad)


def test_massaction_sbml_roundtrip():
    """to_sbml(net) -> from_sbml reproduces the network RHS exactly,
    including a catalytic cycle and a 2A dimerization (stoichiometry 2
    exponents)."""
    from tpusysbio.model.massaction import NetworkBuilder
    from tpusysbio.model.sbml_export import to_sbml

    b = NetworkBuilder()
    b.catalytic("E1", "A", "Ap")          # names with ':' and '.' inside
    b.reaction("dimerize", ["Ap", "Ap"], ["D"])
    b.reaction("decay", ["D"], [])
    net = b.build()

    rng = np.random.default_rng(0)
    y0 = rng.uniform(0.1, 1.0, net.n_species)
    p = rng.uniform(0.5, 3.0, net.n_reactions)
    doc = to_sbml(net, y0, p, name="cascade")
    model, p0 = from_sbml(doc)
    assert model.n_states == net.n_species
    assert model.n_params == net.n_reactions
    np.testing.assert_allclose(p0, p)
    np.testing.assert_allclose(np.asarray(model.y0(jnp.asarray(p))), y0)

    ref_rhs = net.rhs()
    y = jnp.asarray(rng.uniform(0.05, 0.9, net.n_species))
    pj = jnp.asarray(p)
    np.testing.assert_allclose(np.asarray(model.rhs(0.0, y, pj)),
                               np.asarray(ref_rhs(0.0, y, pj)), rtol=1e-14)


def test_sbml_export_validation():
    from tpusysbio.model.massaction import NetworkBuilder
    from tpusysbio.model.sbml_export import to_sbml

    b = NetworkBuilder()
    b.reaction("r1", ["A"], ["B"])
    net = b.build()
    with pytest.raises(ValueError):
        to_sbml(net, [1.0])         # wrong y0 length
    with pytest.raises(ValueError):
        to_sbml(net, {"A": 1.0, "nope": 2.0})
    with pytest.raises(ValueError):
        to_sbml(net, [1.0, 0.0], p=[1.0, 2.0])  # wrong p length


# ----------------------------------------------------------------------
# SBML events with constant-time triggers -> timed-input lowering
# ----------------------------------------------------------------------

_T_CSYM = ('<csymbol encoding="text" definitionURL='
           '"http://www.sbml.org/sbml/symbols/time">t</csymbol>')

EVENT_SBML = f"""<?xml version="1.0" encoding="UTF-8"?>
<sbml xmlns="http://www.sbml.org/sbml/level2/version4" level="2" version="4">
 <model id="dosed">
  <listOfCompartments>
   <compartment id="cell" size="1"/>
  </listOfCompartments>
  <listOfSpecies>
   <species id="A" compartment="cell" initialConcentration="1"/>
  </listOfSpecies>
  <listOfParameters>
   <parameter id="kdeg" value="0.3"/>
   <parameter id="inflow" value="0" constant="false"/>
  </listOfParameters>
  <listOfReactions>
   <reaction id="prod" reversible="false">
    <listOfProducts><speciesReference species="A"/></listOfProducts>
    <kineticLaw>
     <math xmlns="http://www.w3.org/1998/Math/MathML"><ci>inflow</ci></math>
    </kineticLaw>
   </reaction>
   <reaction id="deg" reversible="false">
    <listOfReactants><speciesReference species="A"/></listOfReactants>
    <kineticLaw>
     <math xmlns="http://www.w3.org/1998/Math/MathML">
      <apply><times/><ci>kdeg</ci><ci>A</ci></apply>
     </math>
    </kineticLaw>
   </reaction>
  </listOfReactions>
  <listOfEvents>
   <event id="dose">
    <trigger>
     <math xmlns="http://www.w3.org/1998/Math/MathML">
      <apply><geq/>{_T_CSYM}<cn>2</cn></apply>
     </math>
    </trigger>
    <listOfEventAssignments>
     <eventAssignment variable="A">
      <math xmlns="http://www.w3.org/1998/Math/MathML"><cn>4</cn></math>
     </eventAssignment>
    </listOfEventAssignments>
   </event>
   <event id="feed">
    <trigger>
     <math xmlns="http://www.w3.org/1998/Math/MathML">
      <apply><geq/>{_T_CSYM}<cn>1.5</cn></apply>
     </math>
    </trigger>
    <listOfEventAssignments>
     <eventAssignment variable="inflow">
      <math xmlns="http://www.w3.org/1998/Math/MathML"><cn>1.5</cn></math>
     </eventAssignment>
    </listOfEventAssignments>
   </event>
  </listOfEvents>
 </model>
</sbml>
"""


def test_sbml_events_default_still_raises():
    with pytest.raises(SbmlUnsupportedError, match="events"):
        from_sbml(EVENT_SBML)


def test_sbml_event_lowering_records():
    model, p0, lowered = from_sbml(EVENT_SBML, events="lower")
    assert model.param_names == ("kdeg", "inflow")
    assert model.state_names == ("A",)
    np.testing.assert_allclose(p0, (0.3, 0.0))
    assert lowered == (("state", 2.0, "A", 4.0),
                       ("param", 1.5, "inflow", 1.5))


def test_sbml_event_lowering_simulates_to_scipy_parity():
    """An SBML model with a dosing event (species SET) and a feed event
    (parameter SET), lowered onto Experiment.inputs/input_states,
    simulates to 1e-6 parity vs SciPy piecewise with hard restarts
    (spec the reference meets with solve_ivp events,
    scipy/integrate/_ivp/ivp.py:29-158)."""
    from scipy.integrate import solve_ivp

    from tpusysbio.data import Experiment, ExperimentBatch, Measurement
    from tpusysbio.project import ParameterMap, Project

    model, p0, lowered = from_sbml(EVENT_SBML, events="lower")
    inputs = tuple((t, tgt, v) for kind, t, tgt, v in lowered
                   if kind == "param")
    input_states = tuple((t, tgt, v) for kind, t, tgt, v in lowered
                         if kind == "state")

    # SciPy oracle: dA/dt = inflow - kdeg*A with restarts at 1.5 and 2
    t = np.linspace(0.5, 6.0, 8)
    ys = np.zeros(8)
    y = np.array([1.0])
    for t_lo, t_hi, infl, dose in [(0.0, 1.5, 0.0, None),
                                   (1.5, 2.0, 1.5, None),
                                   (2.0, 6.0, 1.5, 4.0)]:
        if dose is not None:
            y = np.array([dose])
        pts = sorted({float(x) for x in t if t_lo < x <= t_hi} | {t_hi})
        sol = solve_ivp(lambda tt, yy: [infl - 0.3 * yy[0]],
                        (t_lo, t_hi), y, method="BDF", t_eval=pts,
                        rtol=1e-10, atol=1e-13)
        assert sol.success
        for k, tk in enumerate(t):
            if t_lo < tk <= t_hi:
                ys[k] = sol.y[0, pts.index(float(tk))]
        y = sol.y[:, -1]

    meas = (Measurement(obs_index=0, times=t, values=ys,
                        sigmas=np.ones(8)),)
    exps = [Experiment("dosed", meas, inputs=inputs,
                       input_states=input_states)]
    batch = ExperimentBatch.from_experiments(
        exps, param_names=model.param_names,
        state_names=model.state_names)
    pmap = ParameterMap.create(model.param_names, 1, shared=("kdeg",),
                               fixed={"inflow": [0.0]})
    proj = Project(model=model, pmap=pmap, batch=batch,
                   config=SolverConfig(rtol=1e-9, atol=1e-12))
    theta = pmap.pack({"kdeg": 0.3})
    import jax
    r = np.asarray(jax.jit(proj.residuals)(theta))
    assert np.max(np.abs(r)) < 1e-6


def test_sbml_state_dependent_event_still_raises():
    bad = EVENT_SBML.replace(_T_CSYM, "<ci>A</ci>", 1)
    with pytest.raises(SbmlUnsupportedError, match="constant-time"):
        from_sbml(bad, events="lower")
    # non-constant assignment value
    bad2 = EVENT_SBML.replace(
        '<math xmlns="http://www.w3.org/1998/Math/MathML"><cn>4</cn></math>',
        '<math xmlns="http://www.w3.org/1998/Math/MathML"><ci>kdeg</ci>'
        '</math>')
    with pytest.raises(SbmlUnsupportedError, match="not a"):
        from_sbml(bad2, events="lower")
