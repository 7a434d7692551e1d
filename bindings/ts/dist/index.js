/**
 * runmat-tpu TypeScript host bindings — compiled ESM (type annotations
 * stripped from ../index.ts so the package runs without a TS toolchain;
 * index.ts remains the typed source of truth).
 */

import { spawn } from "node:child_process";
import { createInterface } from "node:readline";

export class RunMatError extends Error {
  constructor(identifier, message) {
    super(`${identifier}: ${message}`);
    this.name = "RunMatError";
    this.identifier = identifier;
    this.kind = RunMatError.classify(identifier);
  }

  static classify(id) {
    if (/parse|syntax|Lexer/i.test(id)) return "syntax";
    if (/UndefinedFunction|UndefinedVariable/i.test(id)) return "undefined";
    if (/invalidType|NonNumeric|sizeDimensions|innerdim/i.test(id)) return "type";
    if (/badsubscript|IndexOutOfBounds/i.test(id)) return "index";
    if (/FileIO|NoSuchFile/i.test(id)) return "io";
    if (/gpu|parallel/i.test(id)) return "gpu";
    return "other";
  }
}

export class RunMatSession {
  constructor(options = {}) {
    const python = options.python ?? "python";
    this.nextId = 1;
    this.pending = new Map();
    this.proc = spawn(python, ["-m", "runmat_tpu.cli", "serve"], {
      cwd: options.cwd,
      env: { ...process.env, ...options.env },
      stdio: ["pipe", "pipe", "inherit"],
    });
    this.rl = createInterface({ input: this.proc.stdout });
    this.rl.on("line", (line) => {
      let msg;
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

  request(body) {
    const id = this.nextId++;
    return new Promise((resolve, reject) => {
      this.pending.set(id, { resolve, reject });
      this.proc.stdin.write(JSON.stringify({ id, ...body }) + "\n");
    });
  }

  async execute(source, name = "<ts>") {
    const r = await this.request({ op: "execute", source, name });
    return { ok: r.ok, output: r.output, wallMs: r.wall_ms, error: r.error };
  }

  async run(source, name = "<ts>") {
    const r = await this.execute(source, name);
    if (!r.ok && r.error) throw new RunMatError(r.error.identifier, r.error.message);
    return r.output ?? "";
  }

  async workspace() {
    const r = await this.request({ op: "workspace" });
    return r.workspace ?? {};
  }

  async getValue(varName) {
    const r = await this.request({ op: "get", name: varName });
    if (!r.ok) throw new RunMatError(r.error.identifier, r.error.message);
    return r.value;
  }

  async accelInfo() {
    const r = await this.request({ op: "accel_info" });
    return r.accel;
  }

  async fusionPlans() {
    const r = await this.request({ op: "fusion_plans" });
    return r.plans ?? [];
  }

  async hover(varName) {
    const r = await this.request({ op: "hover", name: varName });
    if (!r.ok) throw new RunMatError(r.error.identifier, r.error.message);
    return r.hover;
  }

  async builtins(query = "") {
    const r = await this.request({ op: "builtins", query });
    return r.builtins ?? [];
  }

  async check(source, name = "<ts>") {
    const r = await this.request({ op: "check", source, name });
    return r.findings ?? [];
  }

  async telemetry() {
    const r = await this.request({ op: "telemetry" });
    return r.telemetry ?? {};
  }

  async reset() {
    await this.request({ op: "reset" });
  }

  async close() {
    await this.request({ op: "shutdown" });
    this.proc.kill();
  }
}

export default RunMatSession;
