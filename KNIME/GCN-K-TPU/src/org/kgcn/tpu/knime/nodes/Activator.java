package org.kgcn.tpu.knime.nodes;

import org.eclipse.ui.plugin.AbstractUIPlugin;
import org.osgi.framework.BundleContext;

/** OSGi bundle activator — same lifecycle shape as the reference plugin's
 * (GCN-K Activator.java): no state beyond the shared plugin instance. */
public class Activator extends AbstractUIPlugin {
    private static Activator plugin;

    @Override
    public void start(final BundleContext context) throws Exception {
        super.start(context);
        plugin = this;
    }

    @Override
    public void stop(final BundleContext context) throws Exception {
        plugin = null;
        super.stop(context);
    }

    public static Activator getDefault() {
        return plugin;
    }
}
