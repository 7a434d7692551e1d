/**
 * runmat-tpu TypeScript host bindings.
 *
 * Reference parity: the reference's npm `runmat` package
 * (bindings/ts/src/index.ts over the wasm session API). This client speaks
 * the JSON-lines session protocol of `python -m runmat_tpu.cli serve`
 * (runmat_tpu/server.py) over a child process, giving TS hosts the same
 * typed session surface: execute, workspace previews, value extraction,
 * provider telemetry.
 */

import { spawn, ChildProcess } from "node:child_process";
import { createInterface, Interface } from "node:readline";

export interface ExecuteResult {
  ok: boolean;
  output?: string;
  wallMs?: number;
  error?: { identifier: string; message: string };
}

export interface ValuePreview {
  class: string;
  size?: number[];
  value?: unknown;
  on_device?: boolean;
}

export interface AccelInfo {
  available: boolean;
  platform?: string;
  stats?: Record<string, number>;
}

export interface FusionPlan {
  kind: string;
  ops: string[];
  n_ops: number;
  n_outputs?: number;
}

export interface HoverCard extends ValuePreview {
  name: string;
  preview?: string;
  device_bytes?: number;
}

export interface BuiltinEntry {
  name: string;
  category: string;
  summary: string;
  min_in: number;
  max_in: number | null;
  max_out: number;
  /** has a device (TPU) fast path via the accel engine */
  accel: boolean;
  /** output must be gathered to host (e.g. disp) */
  sink: boolean;
  /** RunMat extension, hidden under strict-MATLAB compat */
  extension: boolean;
}

/**
 * Typed MATLAB error (≙ the reference npm package's error mapping):
 * `identifier` is the MATLAB identifier ("MATLAB:badsubscript", ...),
 * `kind` buckets the identifier family for programmatic handling.
 */
export class RunMatError extends Error {
  readonly identifier: string;
  readonly kind: "syntax" | "undefined" | "type" | "index" | "io" | "gpu" | "other";

  constructor(identifier: string, message: string) {
    super(`${identifier}: ${message}`);
    this.name = "RunMatError";
    this.identifier = identifier;
    this.kind = RunMatError.classify(identifier);
  }

  static classify(id: string): RunMatError["kind"] {
    if (/parse|syntax|Lexer/i.test(id)) return "syntax";
    if (/UndefinedFunction|UndefinedVariable/i.test(id)) return "undefined";
    if (/invalidType|NonNumeric|sizeDimensions|innerdim/i.test(id)) return "type";
    if (/badsubscript|IndexOutOfBounds/i.test(id)) return "index";
    if (/FileIO|NoSuchFile/i.test(id)) return "io";
    if (/gpu|parallel/i.test(id)) return "gpu";
    return "other";
  }
}

export interface Finding {
  line: number;
  severity: "error" | "warning" | "info";
  identifier: string;
  message: string;
}

interface Pending {
  resolve: (v: any) => void;
  reject: (e: Error) => void;
}

export class RunMatSession {
  private proc: ChildProcess;
  private rl: Interface;
  private nextId = 1;
  private pending = new Map<number, Pending>();

  constructor(options: { python?: string; cwd?: string; env?: Record<string, string> } = {}) {
    const python = options.python ?? "python";
    this.proc = spawn(python, ["-m", "runmat_tpu.cli", "serve"], {
      cwd: options.cwd,
      env: { ...process.env, ...options.env },
      stdio: ["pipe", "pipe", "inherit"],
    });
    this.rl = createInterface({ input: this.proc.stdout! });
    this.rl.on("line", (line) => {
      let msg: any;
      try {
        msg = JSON.parse(line);
      } catch {
        return;
      }
      const p = this.pending.get(msg.id);
      if (p) {
        this.pending.delete(msg.id);
        p.resolve(msg);
      }
    });
  }

  private request(body: Record<string, unknown>): Promise<any> {
    const id = this.nextId++;
    return new Promise((resolve, reject) => {
      this.pending.set(id, { resolve, reject });
      this.proc.stdin!.write(JSON.stringify({ id, ...body }) + "\n");
    });
  }

  /** Execute MATLAB source in the persistent workspace. */
  async execute(source: string, name = "<ts>"): Promise<ExecuteResult> {
    const r = await this.request({ op: "execute", source, name });
    return { ok: r.ok, output: r.output, wallMs: r.wall_ms, error: r.error };
  }

  /** Like execute(), but throws a typed RunMatError on failure. */
  async run(source: string, name = "<ts>"): Promise<string> {
    const r = await this.execute(source, name);
    if (!r.ok && r.error) throw new RunMatError(r.error.identifier, r.error.message);
    return r.output ?? "";
  }

  /** Workspace variable names with shape/class previews. */
  async workspace(): Promise<Record<string, ValuePreview>> {
    const r = await this.request({ op: "workspace" });
    return r.workspace ?? {};
  }

  /** Full value of one variable (numeric arrays as nested JS arrays). */
  async getValue(varName: string): Promise<ValuePreview> {
    const r = await this.request({ op: "get", name: varName });
    if (!r.ok) throw new RunMatError(r.error.identifier, r.error.message);
    return r.value;
  }

  /** Accelerator provider telemetry snapshot. */
  async accelInfo(): Promise<AccelInfo> {
    const r = await this.request({ op: "accel_info" });
    return r.accel;
  }

  /**
   * Cached fused-kernel plans (≙ the reference npm package's fusion-plan
   * introspection, bindings/ts/src/fusion-plan.ts): op sequence + output
   * count per compiled executable.
   */
  async fusionPlans(): Promise<FusionPlan[]> {
    const r = await this.request({ op: "fusion_plans" });
    return r.plans ?? [];
  }

  /**
   * Hover card for one workspace variable (≙ workspace-hover.ts):
   * class/shape/residency, short formatted preview, live HBM bytes.
   */
  async hover(varName: string): Promise<HoverCard> {
    const r = await this.request({ op: "hover", name: varName });
    if (!r.ok) throw new RunMatError(r.error.identifier, r.error.message);
    return r.hover;
  }

  /** Registered builtin catalog, optionally filtered (≙ builtins.ts). */
  async builtins(query = ""): Promise<BuiltinEntry[]> {
    const r = await this.request({ op: "builtins", query });
    return r.builtins ?? [];
  }

  /** Static-analysis findings for a source string (editor diagnostics). */
  async check(source: string, name = "<ts>"): Promise<Finding[]> {
    const r = await this.request({ op: "check", source, name });
    return r.findings ?? [];
  }

  /** Full telemetry snapshot: provider stats, HBM residency, launches. */
  async telemetry(): Promise<Record<string, unknown>> {
    const r = await this.request({ op: "telemetry" });
    return r.telemetry ?? {};
  }

  /** Clear the workspace. */
  async reset(): Promise<void> {
    await this.request({ op: "reset" });
  }

  /** Shut the session process down. */
  async close(): Promise<void> {
    await this.request({ op: "shutdown" });
    this.proc.kill();
  }
}

export default RunMatSession;
