#!/usr/bin/env python
"""Generate the KNIME GCN-K-TPU plugin source tree.

The reference ships a hand-written Eclipse plugin of 16 node types
(/root/reference/KNIME/GCN-K/, 59 Java files) whose entire job is: collect
dialog settings, write a small JSON/flag list, shell out to a Python script,
and pass file paths between nodes as single-column tables.  Here that
contract lives as DATA (``NODE_SPECS``) and the Java sources are emitted
from one template — run::

    python KNIME/plugin_gen.py [outdir]

then import the generated ``GCN-K-TPU`` project into an Eclipse KNIME SDK
workspace and build it like any KNIME plugin.  The Python side the nodes
invoke is `kgcn_tpu.knime.helpers` (tested in this repo without KNIME) and
the ``gcn.py`` CLI forwarders.

Environment contract (same as the reference, GCNNodeModel.java:44-58):
``GCNK_PYTHON_PATH`` = python executable, ``GCNK_SOURCE_PATH`` = this repo.
"""
from __future__ import annotations

import os
import sys

# --------------------------------------------------------------------------
# node contracts — port keys are the single-row "Files" table columns the
# reference nodes pass between each other


def S(name, kind="string", default="", key=None):
    """One dialog setting.  ``key`` is the KNIME settings-file key — kept
    IDENTICAL to the reference NodeModel's CFGKEY string (e.g. "Batch
    Size", "model.py") so a workflow saved with the reference plugin loads
    into this one unchanged."""
    return {"name": name, "kind": kind, "default": default,
            "key": key if key is not None else name}


NODE_SPECS = {
    # preprocessing chain
    "SDFReader": dict(
        inports=[], outports=["Mol Info File"],
        settings=[S("sdf_file", key="SDFFile"),
                  S("atom_num_limit", "int", 70, key="AtomNumLimit"),
                  S("work_dir", key="WorkingDirectory")],
        script="py/prep_mol_info.py",
        args=["--sdf", "$sdf_file", "--atom_num_limit", "$atom_num_limit",
              "--output", "$OUT0"],
        out_files=["$work_dir/mol_info.jbl"],
    ),
    "GraphExtractor": dict(
        inports=["Mol Info File"], outports=["Adjacent File"],
        settings=[],
        script="py/prep_adj.py",
        args=["--mol_info", "$IN0", "--output", "$OUT0"],
        out_files=["$WORKDIR/adjacent.jbl"],
    ),
    "AtomFeatureExtractor": dict(
        inports=["Mol Info File"], outports=["Atom Feature File"],
        settings=[],
        script="py/prep_feat.py",
        args=["--mol_info", "$IN0", "--output", "$OUT0"],
        out_files=["$WORKDIR/atom_feature.jbl"],
    ),
    "CSVLabelExtractor": dict(
        inports=[], outports=["Label File"],
        settings=[S("csv_file", key="CSVFile"),
                  S("work_dir", key="WorkingDirectory")],
        script="py/prep_label.py",
        args=["--label", "$csv_file", "--output", "$OUT0"],
        out_files=["$work_dir/label.jbl"],
    ),
    "GCNDatasetBuilder": dict(
        inports=["Label File", "Adjacent File", "Atom Feature File"],
        outports=["Dataset File"],
        # the reference ALSO declares a CSVFile setting (it re-reads the
        # label CSV); ours flows labels through the inport, the setting is
        # kept for saved-workflow compatibility
        settings=[S("csv_file", key="CSVFile")],
        script="py/prep_dataset.py",
        args=["--label", "$IN0", "--adjacent", "$IN1",
              "--atom_feature", "$IN2", "--output", "$OUT0"],
        out_files=["$WORKDIR/dataset.jbl"],
    ),
    "GCNDatasetSplitter": dict(
        inports=["Dataset File"],
        outports=["Dataset File", "Dataset File"],
        settings=[S("ratio", "double", 0.9, key="Ratio")],
        script="py/split_dataset.py",
        args=["--dataset", "$IN0", "--ratio", "$ratio",
              "--output1", "$OUT0", "--output2", "$OUT1"],
        out_files=["$WORKDIR/dataset_split1.jbl",
                   "$WORKDIR/dataset_split2.jbl"],
    ),
    "AdditionalModalityPreprocessor": dict(
        inports=[], outports=["Modality File"],
        settings=[S("modality", key="Modality"),
                  S("csv_file", key="CSVFile"),
                  S("work_dir", key="WorkingDirectory")],
        script="py/preprocess_modality.py",
        args=["--$modality", "$csv_file", "--output", "$OUT0"],
        out_files=["$work_dir/modality.jbl"],
    ),
    "AddModality": dict(
        inports=["Dataset File", "Modality File"], outports=["Dataset File"],
        settings=[],
        script="py/add_modality.py",
        args=["--dataset", "$IN0", "--modality", "$IN1", "--output", "$OUT0"],
        out_files=["$WORKDIR/dataset_modal.jbl"],
    ),
    # train / infer / explain — these write a JSON config and call gcn.py
    "GCNLearner": dict(
        inports=["Dataset File"], outports=["Model File"],
        # settings keys AND defaults mirror the reference GCNLearner
        # (GCNLearnerNodeModel.java CFGKEY_*/DEFAULT_*); the dotted default
        # model path resolves through the registry's reference aliases
        settings=[S("model_py", key="model.py",
                    default="sample_chem.singletask.solubility.model"),
                  S("validation_data_rate", "double", 0.3,
                    key="Validation Data Rate"),
                  S("epoch", "int", 50, key="Epoch"),
                  S("batch_size", "int", 10, key="Batch Size"),
                  S("patience", "int", 0, key="Patience"),
                  S("learning_rate", "double", 0.3, key="Learning Rate"),
                  S("shuffle_data", "bool", False, key="Shuffle Data"),
                  S("with_feature", "bool", True, key="With Feature"),
                  S("with_node_embedding", "bool", False,
                    key="With Node Embedding"),
                  S("embedding_dim", "int", 10, key="Embedding Dim"),
                  S("normalize_adj_flag", "bool", False,
                    key="Normalize Adj Flag"),
                  S("split_adj_flag", "bool", False, key="Split Adj Flag"),
                  S("order", "int", 1, key="Order"),
                  S("save_interval", "int", 10, key="Save Interval"),
                  S("make_plot", "bool", False, key="Make Plot"),
                  S("profile", "bool", False, key="Profile")],
        gcn_mode="train",
        config_keys=["model.py=$model_py", "dataset=$IN0_clean",
                     "validation_data_rate", "epoch", "batch_size",
                     "learning_rate", "with_feature", "with_node_embedding",
                     "embedding_dim", "normalize_adj_flag", "split_adj_flag",
                     "order", "patience", "shuffle_data", "save_interval",
                     "make_plot", "profile", "save_model=$OUT0"],
        out_files=["$WORKDIR/model.ckpt"],
    ),
    "GCNPredictor": dict(
        inports=["Model File", "Dataset File"],
        outports=["Prediction Data File"],
        settings=[S("model_py", key="model.py",
                    default="sample_chem.singletask.solubility.model"),
                  S("with_feature", "bool", True, key="With Feature"),
                  S("with_node_embedding", "bool", False,
                    key="With Node Embedding"),
                  S("embedding_dim", "int", 10, key="Embedding Dim"),
                  S("normalize_adj_flag", "bool", False,
                    key="Normalize Adj Flag"),
                  S("split_adj_flag", "bool", False, key="Split Adj Flag"),
                  S("order", "int", 1, key="Order")],
        gcn_mode="infer",
        config_keys=["model.py=$model_py", "load_model=$IN0",
                     "dataset=$IN1_clean", "with_feature",
                     "with_node_embedding", "embedding_dim",
                     "normalize_adj_flag", "split_adj_flag", "order",
                     "prediction_data=$OUT0"],
        out_files=["$WORKDIR/prediction_data.jbl"],
    ),
    "GCNVisualizer": dict(
        inports=["Model File", "Dataset File"], outports=["IG Directory"],
        settings=[S("model_py", key="model.py",
                    default="sample_chem.singletask.solubility.model"),
                  S("with_feature", "bool", True, key="With Feature"),
                  S("with_node_embedding", "bool", False,
                    key="With Node Embedding"),
                  S("embedding_dim", "int", 10, key="Embedding Dim"),
                  S("normalize_adj_flag", "bool", False,
                    key="Normalize Adj Flag"),
                  S("split_adj_flag", "bool", False, key="Split Adj Flag"),
                  S("order", "int", 1, key="Order")],
        gcn_mode="visualize",
        config_keys=["model.py=$model_py", "load_model=$IN0",
                     "dataset=$IN1_clean", "with_feature",
                     "with_node_embedding", "embedding_dim",
                     "normalize_adj_flag", "split_adj_flag", "order"],
        out_files=["$WORKDIR/visualization"],
    ),
    # reporting
    "GCNScore": dict(
        inports=["Prediction Data File"], outports=[],
        settings=[S("output_csv")],
        script="py/gcn_score.py",
        args=["--prediction_data", "$IN0", "--output", "$output_csv"],
        out_files=[],
    ),
    "GCNScoreViewer": dict(
        inports=["Prediction Data File"], outports=[],
        settings=[S("output_dir"), S("plot_multitask", "bool", False, key="PlotMultitask")],
        script="py/gcn_score_viewer.py",
        args=["--prediction_data", "$IN0", "--output", "$output_dir"],
        out_files=[],
    ),
    "GCNGraphViewer": dict(
        inports=["IG Directory"], outports=[],
        settings=[S("output_dir")],
        script="py/graph_viewer.py",
        args=["--ig_dir", "$IN0", "--output", "$output_dir"],
        out_files=[],
    ),
}

JAVA_TYPES = {"string": "SettingsModelString", "int": "SettingsModelInteger",
              "double": "SettingsModelDouble", "bool": "SettingsModelBoolean"}
JAVA_DEFAULTS = {"string": lambda v: f'"{v}"', "int": lambda v: str(int(v)),
                 "double": lambda v: str(float(v)),
                 "bool": lambda v: "true" if v else "false"}

PKG = "org.kgcn.tpu.knime.nodes"


def _settings_decl(spec):
    out = []
    for s in spec["settings"]:
        jt = JAVA_TYPES[s["kind"]]
        dv = JAVA_DEFAULTS[s["kind"]](s["default"])
        out.append(
            f'    private final {jt} m_{s["name"]} = '
            f'new {jt}("{s["key"]}", {dv});'
        )
    return "\n".join(out)


def _settings_ops(spec, op):
    lines = []
    for s in spec["settings"]:
        lines.append(f"        m_{s['name']}.{op}(settings);")
    return "\n".join(lines)


def _command_java(name, spec):
    """Emit the execute() body: resolve inputs, build the command, run it."""
    lines = []
    for i, key in enumerate(spec["inports"]):
        lines.append(
            f'        String in{i} = getInPortFile("{key}", inData[{i}]);'
        )
    if spec["inports"]:
        lines.append(
            "        String workDir = new java.io.File(in0).getParent();")
    else:
        lines.append(
            "        String workDir = m_work_dir.getStringValue();")
    for i, of in enumerate(spec["out_files"]):
        expr = of.replace("$WORKDIR", "\" + workDir + \"")
        for s in spec["settings"]:
            expr = expr.replace(
                f"${s['name']}", f"\" + m_{s['name']}.getStringValue() + \"")
        lines.append(f'        String out{i} = ("{expr}")'
                     '.replace("\\"", "");')
    if "script" in spec:
        lines.append(
            '        java.util.List<String> cmd = new java.util.ArrayList<>();')
        lines.append('        cmd.add(System.getenv("GCNK_PYTHON_PATH"));')
        lines.append('        cmd.add(System.getenv("GCNK_SOURCE_PATH") + '
                     f'"/KNIME/{spec["script"]}");')
        for a in spec["args"]:
            expr = a
            for i in range(len(spec["inports"])):
                expr = expr.replace(f"$IN{i}", f"\" + in{i} + \"")
            for i in range(len(spec["out_files"])):
                expr = expr.replace(f"$OUT{i}", f"\" + out{i} + \"")
            for s in spec["settings"]:
                getter = ("getStringValue()" if s["kind"] == "string" else
                          "getIntValue()" if s["kind"] == "int" else
                          "getDoubleValue()" if s["kind"] == "double" else
                          "getBooleanValue()")
                expr = expr.replace(
                    f"${s['name']}", f"\" + m_{s['name']}.{getter} + \"")
            lines.append(f'        cmd.add(("{expr}").replace("\\"", ""));')
        lines.append("        runCommand(cmd, workDir);")
    else:  # gcn.py CLI node: clean dataset, write config JSON, invoke mode
        mode = spec["gcn_mode"]
        lines.append("        String cfgPath = workDir + "
                     f'"/{mode}.json";')
        lines.append("        java.io.PrintWriter pw = "
                     "new java.io.PrintWriter(cfgPath);")
        lines.append('        pw.println("{");')
        for j, key in enumerate(spec["config_keys"]):
            if "=" in key:
                k, v = key.split("=", 1)
            else:
                k = v = key
            if v.startswith("$") and v.endswith("_clean"):
                idx = int(v[3:-6])
                lines.append(
                    f'        String clean{idx} = in{idx}.replace(".jbl", '
                    '"_clean.jbl");')
                lines.append(
                    "        runClean(in%d, clean%d, workDir);" % (idx, idx))
                val = f'"\\"" + clean{idx} + "\\""'
            elif v.startswith("$IN"):
                idx = int(v[3:])
                val = f'"\\"" + in{idx} + "\\""'
            elif v.startswith("$OUT"):
                idx = int(v[4:])
                val = f'"\\"" + out{idx} + "\\""'
            elif v.startswith("$"):
                sname = v[1:]
                s = next(x for x in spec["settings"] if x["name"] == sname)
                if s["kind"] == "string":
                    val = f'"\\"" + m_{sname}.getStringValue() + "\\""'
                else:
                    val = _raw_getter(s)
            else:
                s = next(x for x in spec["settings"] if x["name"] == v)
                val = (f'"\\"" + m_{v}.getStringValue() + "\\""'
                       if s["kind"] == "string" else _raw_getter(s))
            comma = "," if j + 1 < len(spec["config_keys"]) else ""
            lines.append(
                f'        pw.println("    \\"{k}\\" : " + {val} + "{comma}");')
        lines.append('        pw.println("}");')
        lines.append("        pw.close();")
        lines.append('        java.util.List<String> cmd = '
                     'new java.util.ArrayList<>();')
        lines.append('        cmd.add(System.getenv("GCNK_PYTHON_PATH"));')
        lines.append('        cmd.add(System.getenv("GCNK_SOURCE_PATH") + '
                     '"/gcn.py");')
        lines.append(f'        cmd.add("{mode}");')
        lines.append('        cmd.add("--config");')
        lines.append("        cmd.add(cfgPath);")
        lines.append("        runCommand(cmd, workDir);")
    # output table
    lines.append("        return makeOutputTables(exec, new String[] {"
                 + ", ".join(f'"{p}"' for p in spec["outports"]) + "}, "
                 + "new String[] {"
                 + ", ".join(f"out{i}" for i in range(len(spec["out_files"])))
                 + "});")
    return "\n".join(lines)


def _raw_getter(s):
    g = ("getIntValue()" if s["kind"] == "int" else
         "getDoubleValue()" if s["kind"] == "double" else
         "getBooleanValue()")
    return f'String.valueOf(m_{s["name"]}.{g})'


def node_model(name, spec):
    return f"""package {PKG}.{name};

import org.knime.core.node.BufferedDataTable;
import org.knime.core.node.ExecutionContext;
import org.knime.core.node.InvalidSettingsException;
import org.knime.core.node.NodeSettingsRO;
import org.knime.core.node.NodeSettingsWO;
import org.knime.core.node.defaultnodesettings.*;
import org.knime.core.data.DataTableSpec;

import {PKG}.GCNTpuNodeModel;

/** {name} node: see kgcn_tpu.knime.helpers for the Python contract. */
public class {name}NodeModel extends GCNTpuNodeModel {{

{_settings_decl(spec)}

    protected {name}NodeModel() {{
        super({len(spec["inports"])}, {len(spec["outports"])});
    }}

    @Override
    protected BufferedDataTable[] execute(final BufferedDataTable[] inData,
            final ExecutionContext exec) throws Exception {{
{_command_java(name, spec)}
    }}

    @Override
    protected DataTableSpec[] configure(final DataTableSpec[] inSpecs)
            throws InvalidSettingsException {{
        checkEnvironment();
        return makeOutputSpecs({len(spec["outports"])});
    }}

    @Override
    protected void saveSettingsTo(final NodeSettingsWO settings) {{
{_settings_ops(spec, "saveSettingsTo")}
    }}

    @Override
    protected void loadValidatedSettingsFrom(final NodeSettingsRO settings)
            throws InvalidSettingsException {{
{_settings_ops(spec, "loadSettingsFrom")}
    }}

    @Override
    protected void validateSettings(final NodeSettingsRO settings)
            throws InvalidSettingsException {{
{_settings_ops(spec, "validateSettings")}
    }}
}}
"""


def node_factory(name):
    return f"""package {PKG}.{name};

import org.knime.core.node.NodeDialogPane;
import org.knime.core.node.NodeFactory;
import org.knime.core.node.NodeView;

public class {name}NodeFactory extends NodeFactory<{name}NodeModel> {{

    @Override
    public {name}NodeModel createNodeModel() {{
        return new {name}NodeModel();
    }}

    @Override
    public int getNrNodeViews() {{
        return 0;
    }}

    @Override
    public NodeView<{name}NodeModel> createNodeView(final int viewIndex,
            final {name}NodeModel nodeModel) {{
        return null;
    }}

    @Override
    public boolean hasDialog() {{
        return true;
    }}

    @Override
    public NodeDialogPane createNodeDialog() {{
        return new {name}NodeDialog();
    }}
}}
"""


def node_dialog(name, spec):
    comps = []
    for s in spec["settings"]:
        jt = JAVA_TYPES[s["kind"]]
        dv = JAVA_DEFAULTS[s["kind"]](s["default"])
        comp = {"string": "DialogComponentString",
                "int": "DialogComponentNumber",
                "double": "DialogComponentNumber",
                "bool": "DialogComponentBoolean"}[s["kind"]]
        extra = ', 1' if s["kind"] in ("int", "double") else ""
        comps.append(
            f'        addDialogComponent(new {comp}(new {jt}('
            f'"{s["name"]}", {dv}), "{s["name"]}"{extra}));'
        )
    body = "\n".join(comps) or "        // no settings"
    return f"""package {PKG}.{name};

import org.knime.core.node.defaultnodesettings.*;

public class {name}NodeDialog extends DefaultNodeSettingsPane {{

    protected {name}NodeDialog() {{
        super();
{body}
    }}
}}
"""


def factory_xml(name, spec):
    inports = "\n".join(
        f'        <inPort index="{i}" name="{p}">{p}</inPort>'
        for i, p in enumerate(spec["inports"])
    )
    outports = "\n".join(
        f'        <outPort index="{i}" name="{p}">{p}</outPort>'
        for i, p in enumerate(spec["outports"])
    )
    return f"""<?xml version="1.0" encoding="UTF-8"?>
<knimeNode icon="./icon.png" type="Manipulator"
    xmlns="http://knime.org/node/v2.8"
    xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"
    xsi:schemaLocation="http://knime.org/node/v2.8 http://knime.org/node/v2.8.xsd">
    <name>{name}</name>
    <shortDescription>kgcn_tpu {name} node</shortDescription>
    <fullDescription>
        <intro>TPU-native kGCN: {name}.  Shells out to the kgcn_tpu CLI /
        helper scripts (kgcn_tpu.knime.helpers).</intro>
    </fullDescription>
    <ports>
{inports}
{outports}
    </ports>
</knimeNode>
"""


BASE_MODEL = f"""package {PKG};

import java.io.File;
import java.nio.file.Path;
import java.nio.file.Paths;
import java.util.List;

import org.knime.core.data.DataCell;
import org.knime.core.data.DataColumnSpec;
import org.knime.core.data.DataColumnSpecCreator;
import org.knime.core.data.DataRow;
import org.knime.core.data.DataTableSpec;
import org.knime.core.data.RowKey;
import org.knime.core.data.def.DefaultRow;
import org.knime.core.data.def.StringCell;
import org.knime.core.node.BufferedDataContainer;
import org.knime.core.node.BufferedDataTable;
import org.knime.core.node.CanceledExecutionException;
import org.knime.core.node.ExecutionContext;
import org.knime.core.node.ExecutionMonitor;
import org.knime.core.node.InvalidSettingsException;
import org.knime.core.node.NodeModel;

/** Shared base: file-path tables between nodes + subprocess plumbing
 *  (contract identical to the reference plugin's GCNNodeModel). */
public abstract class GCNTpuNodeModel extends NodeModel {{

    protected GCNTpuNodeModel(int nrIn, int nrOut) {{
        super(nrIn, nrOut);
    }}

    protected String getInPortFile(final String key, BufferedDataTable table)
            throws Exception {{
        int col = table.getDataTableSpec().findColumnIndex(key);
        for (DataRow row : table) {{
            if (row.getKey().getString().equals("Files")) {{
                return ((StringCell) row.getCell(col)).getStringValue();
            }}
        }}
        throw new InvalidSettingsException("no Files row with column " + key);
    }}

    protected void checkEnvironment() {{
        if (System.getenv("GCNK_PYTHON_PATH") == null)
            setWarningMessage("Set GCNK_PYTHON_PATH");
        if (System.getenv("GCNK_SOURCE_PATH") == null)
            setWarningMessage("Set GCNK_SOURCE_PATH");
    }}

    protected void runCommand(List<String> cmd, String workDir)
            throws Exception {{
        ProcessBuilder pb = new ProcessBuilder(cmd);
        pb.redirectErrorStream(true);
        Path log = Paths.get(workDir, getClass().getSimpleName() + ".log");
        pb.redirectOutput(log.toFile());
        pb.directory(new File(workDir));
        Process proc = pb.start();
        int rc = proc.waitFor();
        if (rc != 0)
            throw new IllegalStateException(
                "command failed (rc=" + rc + "), see " + log);
    }}

    protected void runClean(String in, String out, String workDir)
            throws Exception {{
        List<String> cmd = new java.util.ArrayList<>();
        cmd.add(System.getenv("GCNK_PYTHON_PATH"));
        cmd.add(System.getenv("GCNK_SOURCE_PATH")
                + "/KNIME/py/clean_dataset.py");
        cmd.add("--dataset"); cmd.add(in);
        cmd.add("--output"); cmd.add(out);
        runCommand(cmd, workDir);
    }}

    protected DataTableSpec[] makeOutputSpecs(int n) {{
        DataTableSpec[] specs = new DataTableSpec[n];
        for (int i = 0; i < n; i++)
            specs[i] = null;  // file columns are named per-execute
        return specs;
    }}

    protected BufferedDataTable[] makeOutputTables(
            ExecutionContext exec, String[] portNames, String[] files) {{
        BufferedDataTable[] out = new BufferedDataTable[portNames.length];
        for (int i = 0; i < portNames.length; i++) {{
            DataColumnSpec col =
                new DataColumnSpecCreator(portNames[i], StringCell.TYPE)
                    .createSpec();
            BufferedDataContainer c =
                exec.createDataContainer(new DataTableSpec(col));
            c.addRowToTable(new DefaultRow(new RowKey("Files"),
                new DataCell[] {{ new StringCell(files[i]) }}));
            c.close();
            out[i] = c.getTable();
        }}
        return out;
    }}

    @Override protected void reset() {{ }}
    @Override protected void loadInternals(File d, ExecutionMonitor m)
        throws CanceledExecutionException {{ }}
    @Override protected void saveInternals(File d, ExecutionMonitor m)
        throws CanceledExecutionException {{ }}
}}
"""


ACTIVATOR = f"""package {PKG};

import org.eclipse.ui.plugin.AbstractUIPlugin;
import org.osgi.framework.BundleContext;

/** OSGi bundle activator — same lifecycle shape as the reference plugin's
 * (GCN-K Activator.java): no state beyond the shared plugin instance. */
public class Activator extends AbstractUIPlugin {{
    private static Activator plugin;

    @Override
    public void start(final BundleContext context) throws Exception {{
        super.start(context);
        plugin = this;
    }}

    @Override
    public void stop(final BundleContext context) throws Exception {{
        plugin = null;
        super.stop(context);
    }}

    public static Activator getDefault() {{
        return plugin;
    }}
}}
"""


def manifest_mf() -> str:
    """OSGi bundle manifest mirroring the reference plugin's wiring
    (GCN-K/META-INF/MANIFEST.MF): same Require-Bundle set, an
    Export-Package entry per node package, lazy activation."""
    exports = ",\n ".join(f"{PKG}.{n}" for n in sorted(NODE_SPECS))
    return (
        "Manifest-Version: 1.0\n"
        "Bundle-ManifestVersion: 2\n"
        "Bundle-Name: Node extension for kGCN-TPU\n"
        f"Bundle-SymbolicName: {PKG};singleton:=true\n"
        "Bundle-Version: 1.0.0\n"
        f"Bundle-Activator: {PKG}.Activator\n"
        "Bundle-Vendor: kgcn-tpu\n"
        "Require-Bundle: org.eclipse.core.runtime,\n"
        " org.knime.workbench.core,\n"
        " org.knime.workbench.repository,\n"
        " org.knime.base\n"
        "Bundle-ActivationPolicy: lazy\n"
        f"Export-Package: {exports}\n"
    )


def plugin_xml():
    entries = "\n".join(
        f'      <node category-path="/community/kgcn_tpu" '
        f'factory-class="{PKG}.{n}.{n}NodeFactory"/>'
        for n in NODE_SPECS
    )
    return f"""<?xml version="1.0" encoding="UTF-8"?>
<?eclipse version="3.0"?>
<plugin>
   <extension point="org.knime.workbench.repository.nodes">
{entries}
   </extension>
</plugin>
"""


def generate(outdir: str) -> list:
    src = os.path.join(outdir, "src", *PKG.split("."))
    os.makedirs(src, exist_ok=True)
    written = []

    def w(path, content):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(content)
        written.append(path)

    w(os.path.join(src, "GCNTpuNodeModel.java"), BASE_MODEL)
    for name, spec in NODE_SPECS.items():
        d = os.path.join(src, name)
        w(os.path.join(d, f"{name}NodeModel.java"), node_model(name, spec))
        w(os.path.join(d, f"{name}NodeFactory.java"), node_factory(name))
        w(os.path.join(d, f"{name}NodeDialog.java"), node_dialog(name, spec))
        w(os.path.join(d, f"{name}NodeFactory.xml"), factory_xml(name, spec))
    w(os.path.join(src, "Activator.java"), ACTIVATOR)
    w(os.path.join(outdir, "plugin.xml"), plugin_xml())
    w(os.path.join(outdir, "META-INF", "MANIFEST.MF"), manifest_mf())
    w(os.path.join(outdir, "build.properties"),
      "source.. = src/\nbin.includes = META-INF/, plugin.xml\n")
    return written


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "GCN-K-TPU"
    )
    files = generate(out)
    print(f"[SAVE] {len(files)} files under {out}")
